"""Pose .txt I/O matching the reference's on-disk checkpoint contract.

The reference persists each stage's poses as whitespace-separated 4x4 row-major
text files (SURVEY §1 L1): relative poses as ``pose_{src}_{tgt}.txt`` (written
at ``1_FGR_pairwise_registration_in_NCLT_dataset.py:177``) and absolute poses as
``pose{i}.txt``.  These loaders are the bridge to the shipped regression
fixtures under /root/reference and to our own stage checkpoints.
"""

from __future__ import annotations

import os

import numpy as np

REFERENCE_ROOT = os.environ.get("PCR_REFERENCE_ROOT", "/root/reference")

# Circuit lengths of the shipped datasets (SURVEY §0)
CIRCUIT_SIZES = {"NCLT": 901, "Courtyard": 8, "Facade": 7}


def load_pose(path: str) -> np.ndarray:
    T = np.loadtxt(path, dtype=np.float64)
    if T.shape != (4, 4):
        raise ValueError(f"{path}: expected 4x4 pose, got {T.shape}")
    return T


def save_pose(path: str, T: np.ndarray, fmt: str = "%.10f") -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savetxt(path, np.asarray(T), fmt=fmt)


def load_relative_circuit(directory: str, n: int) -> np.ndarray:
    """Load the n relative poses of a closed circuit, incl. the loop closure.

    Files: pose_1_0.txt ... pose_{n-1}_{n-2}.txt plus pose_0_{n-1}.txt,
    mirroring the loading at ``2_MGICP_refinement...py:173-175``.
    Returns (n, 4, 4) float64.
    """
    poses = [load_pose(os.path.join(directory, f"pose_{i + 1}_{i}.txt")) for i in range(n - 1)]
    poses.append(load_pose(os.path.join(directory, f"pose_0_{n - 1}.txt")))
    return np.stack(poses)


def load_absolute_poses(directory: str, n: int) -> np.ndarray:
    """Load pose0.txt ... pose{n-1}.txt -> (n, 4, 4)."""
    return np.stack([load_pose(os.path.join(directory, f"pose{i}.txt")) for i in range(n)])


def save_relative_circuit(directory: str, poses: np.ndarray) -> None:
    n = len(poses)
    for i in range(n - 1):
        save_pose(os.path.join(directory, f"pose_{i + 1}_{i}.txt"), poses[i])
    save_pose(os.path.join(directory, f"pose_0_{n - 1}.txt"), poses[n - 1])


def save_absolute_poses(directory: str, poses: np.ndarray) -> None:
    for i, T in enumerate(poses):
        save_pose(os.path.join(directory, f"pose{i}.txt"), T)


# -- Reference fixture helpers ------------------------------------------------

def reference_fixture_dir(stage: str, dataset: str) -> str:
    """stage in {'FGR', 'FGR_GICP', 'absolute_FGR_GICP'}."""
    sub = {
        "FGR": "relative_poses_FGR",
        "FGR_GICP": "relative_poses_FGR_GICP",
        "absolute_FGR_GICP": "absolute_poses_FGR_GICP",
    }[stage]
    return os.path.join(REFERENCE_ROOT, sub, dataset)


def load_reference_relative(stage: str, dataset: str) -> np.ndarray:
    return load_relative_circuit(reference_fixture_dir(stage, dataset), CIRCUIT_SIZES[dataset])


def load_reference_absolute(dataset: str) -> np.ndarray:
    return load_absolute_poses(
        reference_fixture_dir("absolute_FGR_GICP", dataset), CIRCUIT_SIZES[dataset]
    )


def reference_cloud_path(dataset: str, i: int) -> str:
    return os.path.join(
        REFERENCE_ROOT, "nuvens", "nuvens_pre_processadas", dataset, f"s{i}.pcd"
    )
