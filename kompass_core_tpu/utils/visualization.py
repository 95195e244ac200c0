"""Matplotlib-optional visualization helpers.

Role of the reference's ``utils/visualization.py``: plot paths, executed
trajectories, occupancy grids and planner solutions. All functions degrade
to a no-op warning when matplotlib is unavailable.
"""

import logging

import numpy as np

logger = logging.getLogger("kompass_core_tpu")


def _get_plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError:
        logger.warning(
            "Matplotlib is required for visualization; skipping plot"
        )
        return None


def plot_paths(
    paths: dict,
    save_path: str = None,
    title: str = "Paths",
    ax=None,
):
    """Plot named (xs, ys) path tuples on one axis."""
    plt = _get_plt()
    if plt is None:
        return None
    own_fig = ax is None
    if own_fig:
        _, ax = plt.subplots()
    for name, (xs, ys) in paths.items():
        ax.plot(xs, ys, label=name)
    ax.set_xlabel("X [m]")
    ax.set_ylabel("Y [m]")
    ax.set_title(title)
    ax.grid(True)
    ax.legend()
    ax.set_aspect("equal")
    if save_path and own_fig:
        plt.savefig(save_path)
        plt.close()
    return ax


def plot_occupancy_grid(
    grid: np.ndarray, save_path: str = None, title: str = "Occupancy", ax=None
):
    plt = _get_plt()
    if plt is None:
        return None
    own_fig = ax is None
    if own_fig:
        _, ax = plt.subplots()
    ax.imshow(np.asarray(grid), origin="lower", cmap="gray_r")
    ax.set_title(title)
    if save_path and own_fig:
        plt.savefig(save_path)
        plt.close()
    return ax


def plot_trajectory_samples(
    paths_x: np.ndarray,
    paths_y: np.ndarray,
    best_index: int = None,
    save_path: str = None,
    ax=None,
):
    """Plot a batch of rollout samples [S, T] with the winner highlighted
    (role of the reference's DWA debugging-samples plot)."""
    plt = _get_plt()
    if plt is None:
        return None
    own_fig = ax is None
    if own_fig:
        _, ax = plt.subplots()
    for s in range(len(paths_x)):
        ax.plot(paths_x[s], paths_y[s], color="lightgray", linewidth=0.5)
    if best_index is not None:
        ax.plot(
            paths_x[best_index], paths_y[best_index], color="red", linewidth=2
        )
    ax.set_aspect("equal")
    ax.grid(True)
    if save_path and own_fig:
        plt.savefig(save_path)
        plt.close()
    return ax
