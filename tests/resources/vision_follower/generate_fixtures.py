"""Generate the committed RGBD vision-follower fixtures.

Mirrors the reference's fixture scheme
(``tests/resources/vision_follower/generate_fixtures.py:1-20`` upstream):
each case directory holds a 16-bit single-channel ``depth.png`` in
millimeters plus a ``case.json`` with camera intrinsics, robot state, 2D
detections, a click point selecting the target, and LOOSE expected bounds
on the first control command — exact values drift with follower tuning,
so fixtures pin behavior envelopes, not trajectories.

Run ``python generate_fixtures.py`` from this directory to regenerate.
"""

import json
from pathlib import Path

import numpy as np
from PIL import Image

HERE = Path(__file__).parent

CAMERA = {
    "fx": 525.0,
    "fy": 525.0,
    "cx": 320.0,
    "cy": 240.0,
    "img_w": 640,
    "img_h": 480,
    "depth_conversion_factor": 1e-3,
    "min_depth": 0.1,
    "max_depth": 5.0,
}


def _det(x0, y0, w, h):
    return {
        "top_left": [x0, y0],
        "size": [w, h],
        "label": "target",
        "timestamp": 0.0,
    }


def _expected(vx=(-1e3, 1e3), omega=(-1e3, 1e3)):
    return {
        "init_success": True,
        "vx_min": vx[0],
        "vx_max": vx[1],
        "omega_min": omega[0],
        "omega_max": omega[1],
    }


CASES = [
    {
        "name": "static_centered_2m",
        "description": "centered target 2 m ahead: drive forward, no turn",
        "detections": [_det(270, 190, 100, 100)],
        "click": [320, 240],
        "target_depth_m": 2.0,
        "expected": _expected(vx=(0.05, 2.0), omega=(-0.1, 0.1)),
    },
    {
        "name": "far_centered_4m",
        "description": "small centered target 4 m ahead: strong forward",
        "detections": [_det(295, 215, 50, 50)],
        "click": [320, 240],
        "target_depth_m": 4.0,
        "expected": _expected(vx=(0.05, 2.5), omega=(-0.1, 0.1)),
    },
    {
        "name": "close_centered_0p3m",
        "description": "large target 0.3 m ahead (inside follow distance): "
        "no strong forward command",
        "detections": [_det(170, 90, 300, 300)],
        "click": [320, 240],
        "target_depth_m": 0.3,
        "expected": _expected(vx=(-2.0, 0.5), omega=(-0.3, 0.3)),
    },
    {
        "name": "offcenter_left_2m",
        "description": "target left of center at 2 m: turn left (omega > 0)",
        "detections": [_det(120, 190, 100, 100)],
        "click": [170, 240],
        "target_depth_m": 2.0,
        "expected": _expected(vx=(-0.5, 2.0), omega=(0.05, 3.0)),
    },
    {
        "name": "offcenter_right_2m",
        "description": "target right of center at 2 m: turn right (omega < 0)",
        "detections": [_det(420, 190, 100, 100)],
        "click": [470, 240],
        "target_depth_m": 2.0,
        "expected": _expected(vx=(-0.5, 2.0), omega=(-3.0, -0.05)),
    },
    {
        "name": "two_targets_click_selects",
        "description": "two detections; the click picks the right-hand one "
        "-> turn right despite a left candidate",
        "detections": [_det(100, 190, 90, 90), _det(430, 190, 90, 90)],
        "click": [470, 235],
        "target_depth_m": 2.0,
        "expected": _expected(vx=(-0.5, 2.0), omega=(-3.0, -0.05)),
    },
]


def render_depth(case):
    img = np.zeros((CAMERA["img_h"], CAMERA["img_w"]), dtype=np.uint16)
    mm = int(round(case["target_depth_m"] * 1000.0))
    for d in case["detections"]:
        x0, y0 = d["top_left"]
        w, h = d["size"]
        img[y0 : y0 + h, x0 : x0 + w] = mm
    return img


def main():
    for case in CASES:
        out = HERE / case["name"]
        out.mkdir(parents=True, exist_ok=True)
        depth = render_depth(case)
        Image.fromarray(depth).save(out / "depth.png")
        payload = {
            "camera": CAMERA,
            "robot": {"x": 0.0, "y": 0.0, "yaw": 0.0, "speed": 0.0},
            **case,
        }
        (out / "case.json").write_text(json.dumps(payload, indent=2) + "\n")
        print("wrote", case["name"])


if __name__ == "__main__":
    main()
