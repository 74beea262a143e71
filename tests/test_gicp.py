"""GICP engine tests: synthetic convergence + Facade golden slice."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from pcr_tpu.models import evaluate, gicp, multiscale
from pcr_tpu.ops import normals as normals_ops
from pcr_tpu.utils import cloud, poses_io, se3

HAVE_REF = os.path.isdir(os.path.join(poses_io.REFERENCE_ROOT, "nuvens"))


def make_surface(rng, n=2000):
    """Wavy surface with structure in all 6 DoF."""
    xy = rng.uniform(-2, 2, size=(n, 2)).astype(np.float32)
    z = 0.3 * np.sin(2 * xy[:, 0]) + 0.2 * np.cos(3 * xy[:, 1]) + 0.1 * xy[:, 0] * xy[:, 1]
    return np.concatenate([xy, z[:, None].astype(np.float32)], axis=1)


def test_regularize_covariances():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(10, 3, 3)).astype(np.float32)
    cov = A @ np.swapaxes(A, -1, -2)
    reg = np.asarray(gicp.regularize_covariances(jnp.asarray(cov)))
    w = np.linalg.eigvalsh(reg)
    np.testing.assert_allclose(w[:, 0], 1e-3, rtol=1e-2)
    np.testing.assert_allclose(w[:, 1:], 1.0, rtol=1e-3)


def test_covariances_from_normals():
    n = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], np.float32)
    C = np.asarray(gicp.covariances_from_normals(jnp.asarray(n)))
    np.testing.assert_allclose(C[0], np.diag([1, 1, 1e-3]), atol=1e-6)
    np.testing.assert_allclose(C[1], np.diag([1e-3, 1, 1]), atol=1e-6)


def test_gicp_recovers_known_transform(rng):
    pts = make_surface(rng)
    # ground-truth perturbation: ~3 deg rotation + 5 cm translation
    xi = np.array([0.02, -0.03, 0.04, 0.05, -0.02, 0.03], np.float32)
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    src = cloud.from_numpy(pts, capacity=2048)
    tgt_pts = (pts @ T_gt[:3, :3].T) + T_gt[:3, 3]
    tgt = cloud.from_numpy(tgt_pts.astype(np.float32), capacity=2048)
    src = normals_ops.with_normals_knn(src, 20)
    tgt = normals_ops.with_normals_knn(tgt, 20)

    res = gicp.registration_gicp(src, tgt, 0.5, np.eye(4, dtype=np.float32),
                                 loss="l1", max_iteration=50)
    T = np.asarray(res.transformation)
    dR, dt = se3.pose_errors(T, T_gt)
    assert float(dt) < 5e-3, (float(dt), np.asarray(res.fitness))
    assert float(dR) < 5e-3
    assert float(res.fitness) > 0.99
    assert float(res.inlier_rmse) < 0.01


def test_gicp_gm_loss_converges(rng):
    pts = make_surface(rng, 1500)
    src = cloud.from_numpy(pts, capacity=1536)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, 3] = [0.03, -0.02, 0.01]
    tgt = cloud.from_numpy((pts + T_gt[:3, 3]).astype(np.float32), capacity=1536)
    src = normals_ops.with_normals_knn(src, 20)
    tgt = normals_ops.with_normals_knn(tgt, 20)
    res = gicp.registration_gicp(src, tgt, 0.3, np.eye(4, dtype=np.float32),
                                 loss="gm", gm_k=1.0, max_iteration=30)
    _, dt = se3.pose_errors(np.asarray(res.transformation), T_gt)
    assert float(dt) < 5e-3


def test_gicp_no_correspondences_keeps_pose(rng):
    a = cloud.from_numpy(rng.normal(size=(100, 3)).astype(np.float32), capacity=128)
    b_pts = rng.normal(size=(100, 3)).astype(np.float32) + 1000.0
    b = cloud.from_numpy(b_pts, capacity=128)
    a = normals_ops.with_normals_knn(a, 10)
    b = normals_ops.with_normals_knn(b, 10)
    T0 = np.eye(4, dtype=np.float32)
    res = gicp.registration_gicp(a, b, 0.5, T0, max_iteration=5)
    np.testing.assert_allclose(np.asarray(res.transformation), T0, atol=1e-6)
    assert float(res.fitness) == 0.0


def test_evaluate_registration_perfect(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    c = cloud.from_numpy(pts, capacity=512)
    fit, rmse, n = evaluate.evaluate_registration(c, c, 0.1, np.eye(4, dtype=np.float32))
    assert float(fit) == 1.0
    assert float(rmse) < 1e-4


def test_information_matrix_structure(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    c = cloud.from_numpy(pts, capacity=512)
    I = np.asarray(evaluate.information_matrix(c, c, 0.1, np.eye(4, dtype=np.float32)))
    assert I.shape == (6, 6)
    np.testing.assert_allclose(I, I.T, atol=1e-2)
    # translation block = n_corr * I_3
    np.testing.assert_allclose(I[3:, 3:], 300 * np.eye(3), atol=1e-2)
    w = np.linalg.eigvalsh(I)
    assert (w > 0).all()


def test_evaluate_band_matches_exact(rng):
    """The default band-sweep correspondence path must equal the brute-force
    tiled path for both fitness/rmse and the information matrix."""
    pts = rng.uniform(-10, 10, size=(3000, 3)).astype(np.float32)
    pts[:, 2] *= 0.1
    a = cloud.from_numpy(pts, capacity=4096)
    shift = pts + rng.normal(size=(3000, 3)).astype(np.float32) * 0.05
    b = cloud.from_numpy(shift, capacity=4096)
    T = np.eye(4, dtype=np.float32)
    fit_b, rmse_b, n_b = evaluate.evaluate_registration(a, b, 0.2, T, method="band")
    fit_e, rmse_e, n_e = evaluate.evaluate_registration(a, b, 0.2, T, method="exact")
    assert float(n_b) == float(n_e)
    np.testing.assert_allclose(float(fit_b), float(fit_e), rtol=1e-6)
    np.testing.assert_allclose(float(rmse_b), float(rmse_e), rtol=1e-5)
    I_b = np.asarray(evaluate.information_matrix(a, b, 0.2, T, method="band"))
    I_e = np.asarray(evaluate.information_matrix(a, b, 0.2, T, method="exact"))
    np.testing.assert_allclose(I_b, I_e, rtol=1e-5, atol=1e-3)


def test_information_matrix_batch_matches_loop(rng):
    pts = rng.uniform(-5, 5, size=(800, 3)).astype(np.float32)
    clouds = [
        cloud.from_numpy(
            pts + rng.normal(size=(800, 3)).astype(np.float32) * 0.02, capacity=1024
        )
        for _ in range(3)
    ]
    src = cloud.stack_clouds(clouds)
    tgt = cloud.stack_clouds(clouds[::-1])
    T = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    batched = np.asarray(evaluate.information_matrix_batch(src, tgt, 0.2, T))
    for k in range(3):
        single = np.asarray(
            evaluate.information_matrix(clouds[k], clouds[2 - k], 0.2, T[k])
        )
        np.testing.assert_allclose(batched[k], single, rtol=1e-5, atol=1e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_mgicp_facade_golden_pair():
    """Minimum end-to-end slice (SURVEY §7 step 4): refine Facade s1->s0 from
    the FGR fixture pose; must land near the FGR_GICP fixture pose."""
    c0, c1 = cloud.load_dataset("Facade", indices=[0, 1])
    T_fgr = poses_io.load_pose(
        os.path.join(poses_io.reference_fixture_dir("FGR", "Facade"), "pose_1_0.txt")
    )
    T_ref = poses_io.load_pose(
        os.path.join(poses_io.reference_fixture_dir("FGR_GICP", "Facade"), "pose_1_0.txt")
    )
    res = multiscale.multiscale_gicp(
        c1, c0, T_fgr.astype(np.float32), n_scales=5, iterations=30,
        scale_capacities=(8192, 8192, 16384, 16384, 32768),
    )
    T = np.asarray(res.transformation)
    dR, dt = se3.pose_errors(T, T_ref)
    # FGR fixture is ~decimeters off; M-GICP must close to centimeters of the
    # reference's own refinement result.
    dR0, dt0 = se3.pose_errors(T_fgr, T_ref)
    assert float(dt) < 0.05, (float(dt), float(dt0))
    assert float(dR) < 0.02, (float(dR), float(dR0))
    # Inlier fraction at the 0.1 m fine scale is bounded by the true scan
    # overlap (~35% for this pair); measured 0.353 on the converged pose.
    assert float(res.fitness) > 0.3
