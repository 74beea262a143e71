"""CPU reference implementation of the stage-2 M-GICP pipeline.

Stand-in for the reference's Open3D-C++ per-pair path (the environment has no
open3d to rerun; SURVEY §6 notes the reference records no numbers).  Same
algorithm per pair — voxel downsample, statistical outlier removal, KNN-20
normals, 5-scale GICP(L1) with the 2_...py schedules — implemented with
numpy + scipy cKDTree (C spatial index + LAPACK eigh, i.e. a reasonable
CPU-native baseline; Open3D's C++ core is typically within a small factor).

Run:  python benchmarks/cpu_baseline.py [n_pairs]
Writes benchmarks/baseline_cpu.json with pairs/sec, consumed by bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcr_tpu.utils import pcd, poses_io  # noqa: E402

EPS = 1e-3


def voxel_downsample(pts, v):
    ijk = np.floor((pts - pts.min(0)) / v).astype(np.int64)
    key = (ijk[:, 0] << 42) + (ijk[:, 1] << 21) + ijk[:, 2]
    order = np.argsort(key)
    key_s, pts_s = key[order], pts[order]
    boundary = np.concatenate([[True], key_s[1:] != key_s[:-1]])
    seg = np.cumsum(boundary) - 1
    sums = np.zeros((seg[-1] + 1, 3))
    np.add.at(sums, seg, pts_s)
    counts = np.bincount(seg)
    return sums / counts[:, None]


def remove_outliers(pts, k=30, std_ratio=1.0):
    tree = cKDTree(pts)
    d, _ = tree.query(pts, k + 1)
    mean_d = d[:, 1:].mean(1)
    thresh = mean_d.mean() + std_ratio * mean_d.std(ddof=1)
    return pts[mean_d <= thresh]


def estimate_covariances(pts, k=20):
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k)
    nb = pts[idx]
    mean = nb.mean(1, keepdims=True)
    c = nb - mean
    cov = np.einsum("nki,nkj->nij", c, c) / k
    w, V = np.linalg.eigh(cov)
    d = np.array([EPS, 1.0, 1.0])
    return np.einsum("nik,k,njk->nij", V, d, V)


def skew(v):
    out = np.zeros(v.shape[:-1] + (3, 3))
    out[..., 0, 1] = -v[..., 2]; out[..., 0, 2] = v[..., 1]
    out[..., 1, 0] = v[..., 2]; out[..., 1, 2] = -v[..., 0]
    out[..., 2, 0] = -v[..., 1]; out[..., 2, 1] = v[..., 0]
    return out


def se3_exp(xi):
    from scipy.spatial.transform import Rotation

    T = np.eye(4)
    T[:3, :3] = Rotation.from_rotvec(xi[:3]).as_matrix()
    T[:3, 3] = xi[3:]
    return T


def gicp(src, src_cov, tgt, tgt_cov, max_dist, T, iters=100, tol=1e-6):
    tree = cKDTree(tgt)
    prev_fit, prev_rmse = -1.0, -1.0
    for _ in range(iters):
        p = src @ T[:3, :3].T + T[:3, 3]
        d, j = tree.query(p, 1, distance_upper_bound=max_dist)
        valid = np.isfinite(d)
        fit = valid.mean()
        rmse = np.sqrt((d[valid] ** 2).mean()) if valid.any() else 0.0
        if abs(fit - prev_fit) < tol and abs(rmse - prev_rmse) < tol:
            break
        prev_fit, prev_rmse = fit, rmse
        pv, jv = p[valid], j[valid]
        q = tgt[jv]
        r = q - pv
        M = np.linalg.inv(tgt_cov[jv] + np.einsum("ij,njk,lk->nil", T[:3, :3], src_cov[valid], T[:3, :3]))
        w = 1.0 / np.maximum(np.linalg.norm(r, axis=1), 1e-8)  # L1 loss
        G = np.concatenate([skew(pv), -np.broadcast_to(np.eye(3), pv.shape + (3,))], axis=2)
        MG = np.einsum("nij,njk->nik", M, G)
        H = np.einsum("nij,nik,n->jk", G, MG, w)
        g = np.einsum("nij,ni,n->j", MG, r, w)
        xi = -np.linalg.solve(H + 1e-6 * np.trace(H) / 6 * np.eye(6), g)
        T = se3_exp(xi) @ T
    return T


def mgicp_pair(src_pts, tgt_pts, T0, n_scales=5, iters=100):
    scales = [0.1 + 0.1 * i for i in reversed(range(n_scales))]
    dists = [3 * scales[0], 2.5 * scales[1], 2 * scales[2], 1.5 * scales[3], scales[4]]
    T = T0.copy()
    for v, d in zip(scales, dists):
        s = remove_outliers(voxel_downsample(src_pts, v))
        t = remove_outliers(voxel_downsample(tgt_pts, v))
        s_cov = estimate_covariances(s)
        t_cov = estimate_covariances(t)
        T = gicp(s, s_cov, t, t_cov, d, T, iters=iters)
    return T


def main(n_pairs=4):
    clouds = [
        pcd.read_pcd(poses_io.reference_cloud_path("NCLT", i)).points.astype(np.float64)
        for i in range(n_pairs + 1)
    ]
    init = [
        poses_io.load_pose(
            os.path.join(poses_io.reference_fixture_dir("FGR", "NCLT"), f"pose_{i + 1}_{i}.txt")
        )
        for i in range(n_pairs)
    ]
    t0 = time.time()
    for i in range(n_pairs):
        mgicp_pair(clouds[i + 1], clouds[i], init[i])
    dt = time.time() - t0
    result = {
        "pairs_per_sec": n_pairs / dt,
        "seconds_per_pair": dt / n_pairs,
        "n_pairs": n_pairs,
        "workload": "NCLT stage-2 M-GICP (5 scales, 100 iters, L1)",
        "impl": "numpy+scipy cKDTree CPU baseline",
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baseline_cpu.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
