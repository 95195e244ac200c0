"""Path recording, save/load and stepwise execution.

Role of the reference's ``py_path_tools/executor.py`` (path recording +
XML save/load + execution): record robot poses into a PathSample, persist
paths to XML, and replay them point by point.
"""

import os
import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np

from ..datatypes.path_sample import PathPoint, PathSample


class PathRecorder:
    """Accumulates robot poses into a path, with distance-based pruning."""

    def __init__(self, min_point_distance: float = 0.05):
        self.min_point_distance = float(min_point_distance)
        self._xs = []
        self._ys = []
        self._hs = []

    def record(self, x: float, y: float, heading: float = 0.0) -> bool:
        if self._xs:
            d = np.hypot(x - self._xs[-1], y - self._ys[-1])
            if d < self.min_point_distance:
                return False
        self._xs.append(float(x))
        self._ys.append(float(y))
        self._hs.append(float(heading))
        return True

    def get_path(self) -> PathSample:
        path = PathSample(len(self._xs))
        path.set_path(
            np.asarray(self._xs), np.asarray(self._ys), np.asarray(self._hs)
        )
        return path

    def clear(self):
        self._xs, self._ys, self._hs = [], [], []

    # --- persistence (XML like the reference executor) ---

    @staticmethod
    def save_xml(path: PathSample, file_path: str, name: str = "recorded"):
        root = ET.Element("path", attrib={"name": name})
        for i in range(len(path)):
            ET.SubElement(
                root,
                "point",
                attrib={
                    "idx": str(i),
                    "x": repr(float(path.x_points[i])),
                    "y": repr(float(path.y_points[i])),
                    "heading": repr(float(path.heading_points[i])),
                },
            )
        os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
        ET.ElementTree(root).write(file_path)

    @staticmethod
    def load_xml(file_path: str) -> PathSample:
        root = ET.parse(file_path).getroot()
        points = root.findall("point")
        path = PathSample(len(points))
        for el in points:
            idx = int(el.get("idx"))
            path.set_point(
                idx,
                float(el.get("x")),
                float(el.get("y")),
                float(el.get("heading", 0.0)),
            )
        return path


class PathExecutor:
    """Steps through a recorded path, yielding the next target point when
    the previous one is reached."""

    def __init__(self, path: PathSample, reach_tolerance: float = 0.1):
        self.path = path
        self.reach_tolerance = float(reach_tolerance)
        self._idx = 0

    @property
    def finished(self) -> bool:
        return self._idx >= len(self.path)

    def current_target(self) -> Optional[PathPoint]:
        if self.finished:
            return None
        return PathPoint(
            idx=self._idx,
            x=self.path.x_points[self._idx],
            y=self.path.y_points[self._idx],
            heading=self.path.heading_points[self._idx],
        )

    def update(self, x: float, y: float) -> Optional[PathPoint]:
        """Advance past reached points and return the active target."""
        while not self.finished:
            tx = self.path.x_points[self._idx]
            ty = self.path.y_points[self._idx]
            if np.hypot(x - tx, y - ty) > self.reach_tolerance:
                break
            self._idx += 1
        return self.current_target()
