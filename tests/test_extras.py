"""Tests for parity extras: Umeyama, eigen features, sampling, viz artifacts."""

import os

import numpy as np
import jax.numpy as jnp

from pcr_tpu import viz
from pcr_tpu.models import features, manual
from pcr_tpu.utils import cloud, se3
from tests.conftest import random_rotation


def test_umeyama_recovers_rigid_transform(rng):
    pts = rng.normal(size=(50, 3))
    R = random_rotation(rng)
    t = np.array([1.0, -2.0, 0.5])
    q = pts @ R.T + t
    T = np.asarray(manual.estimate_point_to_point(pts, q))
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-8)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-8)


def test_umeyama_reflection_guard(rng):
    # planar points are degenerate enough to attract reflections
    pts = np.concatenate([rng.normal(size=(30, 2)), np.zeros((30, 1))], axis=1)
    R = random_rotation(rng)
    q = pts @ R.T
    T = np.asarray(manual.estimate_point_to_point(pts, q))
    assert np.linalg.det(T[:3, :3]) > 0.99


def test_manual_registration_with_picks(rng):
    pts = rng.normal(size=(100, 3))
    R = random_rotation(rng)
    t = np.array([0.2, 0.1, -0.3])
    q = pts @ R.T + t
    picks = [3, 17, 42, 77]
    T = np.asarray(manual.manual_registration(pts, q, picks, picks))
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-8)


def test_random_rotation_matrix_is_rotation(rng):
    M = manual.random_rotation_matrix(rng=rng)
    np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(M), 1.0, atol=1e-12)


def test_eigen_features_plane_vs_line(rng):
    # planar cloud: high planarity, low sphericity
    xy = rng.uniform(-1, 1, size=(500, 2)).astype(np.float32)
    plane = np.concatenate([xy, 0.001 * rng.normal(size=(500, 1)).astype(np.float32)], axis=1)
    c = cloud.from_numpy(plane, capacity=512)
    f_plane = np.asarray(features.extract_eigen_features(c.points, c.mask))
    # linear cloud: high linearity
    tline = rng.uniform(-1, 1, size=(500, 1)).astype(np.float32)
    line = np.concatenate([tline, 0.001 * rng.normal(size=(500, 2)).astype(np.float32)], axis=1)
    c2 = cloud.from_numpy(line, capacity=512)
    f_line = np.asarray(features.extract_eigen_features(c2.points, c2.mask))
    assert f_plane[1] > 0.5 and f_plane[2] < 0.05   # planarity high, sphericity low
    assert f_line[0] > 0.9                          # linearity high
    assert f_plane.shape == (7,)


def test_multiscale_sampling_fractions():
    f = np.asarray(features.multiscale_sampling_fractions(5, 0.1))
    assert f.shape == (5,)
    assert (np.diff(f) < 0).all()          # decreasing with scale
    np.testing.assert_allclose(np.linalg.norm(f), 1.0, rtol=1e-6)


def test_random_downsample(rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    c = cloud.from_numpy(pts, capacity=1024)
    d = features.random_downsample(c, 0.3, seed=1)
    frac = int(d.count()) / 1000
    assert 0.2 < frac < 0.4


def test_viz_artifacts(tmp_path, rng):
    poses = np.stack([np.eye(4)] * 5)
    for i in range(5):
        poses[i][:3, 3] = [i, 0, 0]
    p1 = viz.export_trajectory(str(tmp_path / "traj.ply"), poses)
    assert "element vertex 5" in open(p1).read()
    clouds = [cloud.from_numpy(rng.normal(size=(50, 3)).astype(np.float32), capacity=64)
              for _ in range(3)]
    p2 = viz.export_registered_clouds(str(tmp_path / "clouds.ply"), clouds, poses[:3])
    txt = open(p2).read()
    assert "element vertex 150" in txt and "uchar red" in txt
    p3 = viz.plot_pose_errors(str(tmp_path / "err.png"), {"LUM": rng.uniform(size=10)})
    assert (tmp_path / "err.png").stat().st_size > 1000
    p4 = viz.plot_pair_metric(str(tmp_path / "rmse.png"),
                              {"FGR": rng.uniform(size=7), "FGR+GICP": rng.uniform(size=7)},
                              "RMSE")
    p5 = viz.plot_time_bars(str(tmp_path / "time.png"), rng.uniform(size=7))
    assert (tmp_path / "time.png").exists()


def test_flatten_to_xy(rng):
    pts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    flat = np.asarray(manual.flatten_to_xy(pts))
    assert (flat[:, 2] == 0).all()
    np.testing.assert_allclose(flat[:, :2], np.asarray(pts)[:, :2])


def test_animation_exports(tmp_path, rng):
    """P16 animation parity: pose-interpolated frame sequences (PLY + GIF)."""
    from pcr_tpu import viz
    from pcr_tpu.utils import cloud as cloud_mod, se3
    import jax.numpy as jnp

    pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    c0 = cloud_mod.from_numpy(pts, capacity=512)
    T = np.eye(4)
    T[:3, 3] = [0.5, 0.2, 0.0]
    c1 = cloud_mod.from_numpy((pts + T[:3, 3]).astype(np.float32), capacity=512)

    frames = viz.animate_pair(str(tmp_path / "pair"), c1, c0, np.linalg.inv(T),
                              n_frames=5, max_points=200)
    assert len(frames) == 5 and all(os.path.exists(p) for p in frames)
    # first frame: source at identity; last frame: source registered
    first = np.loadtxt(frames[0], skiprows=10, usecols=(0, 1, 2), max_rows=200)
    last = np.loadtxt(frames[-1], skiprows=10, usecols=(0, 1, 2), max_rows=200)
    assert np.abs(first.mean(axis=0) - last.mean(axis=0) - T[:3, 3]).max() < 0.1

    poses = np.stack([np.eye(4), T])
    arts = viz.animate_reconstruction(
        str(tmp_path / "rec"), [c0, c1], poses, frames_per_cloud=3,
        max_points=100, gif=True, ply_frames=True)
    gifs = [p for p in arts if p.endswith(".gif")]
    assert len(gifs) == 1 and os.path.getsize(gifs[0]) > 1000
    assert sum(p.endswith(".ply") for p in arts) == 6


def test_viz_p17_parity(tmp_path, rng):
    """Round-2 P17/N13 additions: NN-distance boxplot, grouped RMSE bars,
    RMSE-vs-iteration curves, correspondence-line export."""
    from pcr_tpu import viz
    from pcr_tpu.utils import cloud as cloud_mod

    c1 = cloud_mod.from_numpy(rng.normal(size=(60, 3)).astype(np.float32), capacity=64)
    c2 = cloud_mod.from_numpy(
        (rng.normal(size=(50, 3)) * 2).astype(np.float32), capacity=64)
    p = viz.plot_nn_distance_boxplot(
        str(tmp_path / "nn_box.png"),
        {"Voxel downsampling": c1, "Hybrid downsampling": c2})
    assert (tmp_path / "nn_box.png").stat().st_size > 1000

    p = viz.plot_pair_metric_bars(
        str(tmp_path / "rmse_bar.png"),
        {"FGR": rng.uniform(size=7), "FGR+GICP": rng.uniform(size=7)}, "RMSE")
    assert (tmp_path / "rmse_bar.png").stat().st_size > 1000

    log = {"inlier_rmse": rng.uniform(size=20), "fitness": rng.uniform(size=20)}
    viz.plot_rmse_vs_iterations(str(tmp_path / "rmse_it.png"), log)
    viz.plot_rmse_vs_iterations(
        str(tmp_path / "rmse_it_scales.png"), [log, log, log], per_scale=True)
    assert (tmp_path / "rmse_it_scales.png").stat().st_size > 1000

    corr = np.stack([np.arange(40), np.arange(40)], axis=1)
    T = np.eye(4); T[:3, 3] = [0.5, 0, 0]
    p = viz.export_correspondences(
        str(tmp_path / "corr.ply"), c1, c1, T, corr, n=25)
    txt = open(p).read()
    assert "element vertex 50" in txt and "element edge 25" in txt


def test_gicp_loss_log(rng):
    """Per-iteration loss log (Open3D log_loss=True analogue): RMSE must be
    non-increasing to convergence on a perturbed self-registration."""
    import jax.numpy as jnp

    from pcr_tpu.models import gicp
    from pcr_tpu.ops import normals as nops
    from pcr_tpu.utils import cloud as cloud_mod

    pts = rng.normal(size=(400, 3)).astype(np.float32)
    c = cloud_mod.from_numpy(pts, capacity=512)
    c = nops.with_normals_knn(c, 10)
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = [0.05, -0.03, 0.02]
    res, log = gicp.gicp_loss_log(c, c, 0.3, T0, max_iteration=12)
    rmse = np.asarray(log["inlier_rmse"])
    assert rmse.shape == (12,)
    assert rmse[-1] < 1e-3 and rmse[0] > rmse[-1]
    assert float(res.fitness) > 0.99
