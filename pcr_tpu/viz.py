"""Headless visualization & reporting artifacts (SURVEY P16/P17, N13).

The reference drives an interactive OpenGL window (``o3d.visualization``);
TPU-side we export equivalent artifacts instead:
  * merged registered clouds -> PLY (colors per scan), replacing
    ``apply_poses_in_clouds`` (1_...py:74-90);
  * trajectory line sets -> PLY edges, replacing
    ``criar_trejetoria_com_linhas`` (3_...py:104-126) /
    ``draw_circuit_lines`` (3_...py:44-54);
  * the reference's matplotlib reports: pose-error curves
    (1_...py:166-172, 3_...py:376-386), RMSE/fitness per pair
    (plot_RMSE_line / plot_fitness_line, ALL_FUNCTIONS.py:869-893),
    per-pair timing bars (plot_bar_time, ALL_FUNCTIONS.py:924-929).

Matplotlib uses the Agg backend; every function writes a file and returns its
path.
"""

from __future__ import annotations

import os

import numpy as np

from .utils import se3
from .utils.cloud import Cloud


def _ensure_dir(path):
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    return path


def write_ply(path, points: np.ndarray, colors: np.ndarray | None = None,
              edges: np.ndarray | None = None) -> str:
    """Minimal binary-less PLY writer (ascii; readable by Meshlab/CloudCompare)."""
    points = np.asarray(points)
    n = len(points)
    has_color = colors is not None
    lines = ["ply", "format ascii 1.0", f"element vertex {n}",
             "property float x", "property float y", "property float z"]
    if has_color:
        lines += ["property uchar red", "property uchar green", "property uchar blue"]
    if edges is not None:
        lines += [f"element edge {len(edges)}", "property int vertex1", "property int vertex2"]
    lines += ["end_header"]
    with open(_ensure_dir(path), "w") as fh:
        fh.write("\n".join(lines) + "\n")
        if has_color:
            c8 = np.clip(np.asarray(colors) * 255, 0, 255).astype(np.uint8)
            for p, c in zip(points, c8):
                fh.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")
        else:
            for p in points:
                fh.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        if edges is not None:
            for a, b in np.asarray(edges):
                fh.write(f"{int(a)} {int(b)}\n")
    return path


def export_registered_clouds(path, clouds: list[Cloud], poses: np.ndarray,
                             max_points_per_cloud: int = 20000, seed: int = 0) -> str:
    """Apply absolute poses and merge into one colored PLY
    (headless ``apply_poses_in_clouds``)."""
    rng = np.random.default_rng(seed)
    all_pts, all_cols = [], []
    for i, (c, T) in enumerate(zip(clouds, np.asarray(poses))):
        pts = np.asarray(c.points)[np.asarray(c.mask)]
        if len(pts) > max_points_per_cloud:
            pts = pts[rng.choice(len(pts), max_points_per_cloud, replace=False)]
        pts = pts @ T[:3, :3].T + T[:3, 3]
        color = rng.uniform(0.15, 0.95, size=3)
        all_pts.append(pts)
        all_cols.append(np.tile(color, (len(pts), 1)))
    return write_ply(path, np.concatenate(all_pts), np.concatenate(all_cols))


def export_trajectory(path, poses: np.ndarray, closed: bool = True) -> str:
    """Trajectory polyline as PLY edges (``criar_trejetoria_com_linhas``)."""
    t = np.asarray(poses)[:, :3, 3]
    n = len(t)
    edges = [[i, i + 1] for i in range(n - 1)]
    if closed:
        edges.append([n - 1, 0])
    return write_ply(path, t, edges=np.asarray(edges))


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_pose_errors(path, error_series: dict[str, np.ndarray],
                     ylabel: str = "Error (m)") -> str:
    """Per-pose error curves for any number of methods (3_...py:376-386)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 5))
    for label, values in error_series.items():
        ax.plot(np.asarray(values), label=label)
    ax.set_xlabel("Absolute poses")
    ax.set_ylabel(ylabel)
    ax.grid(True)
    ax.legend()
    fig.savefig(_ensure_dir(path), dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_pair_metric(path, series: dict[str, np.ndarray], ylabel: str) -> str:
    """Per-pair RMSE/fitness comparison lines, labeled i-(i+1) with the final
    wraparound pair (plot_RMSE_line / plot_fitness_line)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(12, 5))
    n = len(next(iter(series.values())))
    labels = [f"{i}-{i + 1}" for i in range(n - 1)] + [f"{n - 1}-0"]
    for name, values in series.items():
        ax.plot(range(n), np.asarray(values), label=name)
    step = max(n // 20, 1)
    ax.set_xticks(range(0, n, step), labels[::step], rotation=45, fontsize=7)
    ax.set_xlabel("Pairs")
    ax.set_ylabel(ylabel)
    ax.grid(True)
    ax.legend()
    fig.savefig(_ensure_dir(path), dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_time_bars(path, seconds: np.ndarray, labels: list[str] | None = None) -> str:
    """Per-item timing bars (plot_bar_time, 3_...py:14-18)."""
    plt = _plt()
    seconds = np.asarray(seconds)
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.bar(range(len(seconds)), seconds)
    if labels:
        ax.set_xticks(range(len(seconds)), labels, rotation=45, fontsize=7)
    ax.set_ylabel("Time (s)")
    fig.savefig(_ensure_dir(path), dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def report_circuit(out_dir: str, clouds, results: dict[str, np.ndarray],
                   reference: np.ndarray | None = None) -> list[str]:
    """One-call report: trajectories + error curves for each method."""
    paths = []
    for name, poses in results.items():
        paths.append(export_trajectory(os.path.join(out_dir, f"traj_{name}.ply"), poses))
    if reference is not None:
        errs = {}
        for name, poses in results.items():
            _, dt = se3.pose_errors(np.asarray(poses), np.asarray(reference))
            errs[name] = np.asarray(dt)
        paths.append(plot_pose_errors(os.path.join(out_dir, "pose_errors.png"), errs))
    return paths
