"""PCD / pose-file I/O tests against the shipped reference data."""

import os

import numpy as np
import pytest

from pcr_tpu.utils import cloud, pcd, poses_io, se3

import jax.numpy as jnp

REF = poses_io.REFERENCE_ROOT
HAVE_REF = os.path.isdir(os.path.join(REF, "nuvens"))

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")


def test_read_nclt_scan():
    data = pcd.read_pcd(poses_io.reference_cloud_path("NCLT", 0))
    assert data.points.shape == (18421, 3)  # POINTS header of s0.pcd (SURVEY §0)
    assert data.points.dtype == np.float32
    assert np.isfinite(data.points).all()
    # NCLT scans are metric-scale LiDAR: sane extents
    extent = data.points.max(0) - data.points.min(0)
    assert (extent > 1.0).all() and (extent < 1000.0).all()


def test_read_facade_scan_rgb():
    data = pcd.read_pcd(poses_io.reference_cloud_path("Facade", 0))
    assert data.points.shape == (44728, 3)
    assert data.colors is not None and data.colors.shape == (44728, 3)
    assert (data.colors >= 0).all() and (data.colors <= 1).all()
    assert data.colors.std() > 0.01  # actual color variation decoded


def test_write_read_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    cols = rng.uniform(size=(1000, 3)).astype(np.float32)
    path = tmp_path / "t.pcd"
    pcd.write_pcd(path, pts, cols)
    back = pcd.read_pcd(path)
    np.testing.assert_allclose(back.points, pts, atol=1e-6)
    np.testing.assert_allclose(back.colors, cols, atol=1 / 255 + 1e-6)


def test_padded_cloud():
    c = cloud.load_cloud(poses_io.reference_cloud_path("NCLT", 0), capacity=32768)
    assert c.points.shape == (32768, 3)
    assert int(c.count()) == 18421
    # padding parked at sentinel
    assert float(c.masked_points()[-1, 0]) == cloud.PAD_COORD


def test_compact_decimates_uniformly(rng):
    """compact() below the valid count must keep spatially uniform coverage,
    not a prefix: Cloud points arrive cell-sorted (voxel output), so a prefix
    crop would keep one corner of the scene — which silently destroyed the
    overlap region in graph-builder registrations."""
    import jax.numpy as jnp

    n = 4096
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = np.sort(rng.uniform(0.0, 100.0, size=n))  # sorted axis
    pts[:, 1:] = rng.normal(size=(n, 2))
    c = cloud.Cloud(points=jnp.asarray(pts), mask=jnp.ones(n, bool))
    cc = cloud.compact(c, 512)
    kept = np.asarray(cc.points)[np.asarray(cc.mask)]
    assert kept.shape[0] == 512
    # uniform stride over a sorted axis keeps the full extent
    assert kept[:, 0].min() < 1.0 and kept[:, 0].max() > 95.0
    assert np.unique(kept[:, 0]).size == 512  # no duplicated rows
    # lossless case unchanged: capacity >= n_valid keeps every valid point
    half = cloud.Cloud(points=jnp.asarray(pts),
                       mask=jnp.asarray(np.arange(n) % 2 == 0))
    ch = cloud.compact(half, n // 2)
    assert int(ch.count()) == n // 2
    np.testing.assert_array_equal(
        np.asarray(ch.points)[np.asarray(ch.mask)], pts[::2])


def test_load_reference_relative_circuit():
    poses = poses_io.load_reference_relative("FGR_GICP", "Facade")
    assert poses.shape == (7, 4, 4)
    # homogeneous rows
    np.testing.assert_allclose(poses[:, 3], np.tile([0, 0, 0, 1], (7, 1)), atol=1e-12)
    # rotations orthonormal
    R = poses[:, :3, :3]
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape), atol=1e-6)


def test_absolute_fixture_pose0_identity():
    T = poses_io.load_reference_absolute("Facade")
    np.testing.assert_allclose(T[0], np.eye(4), atol=1e-9)


def test_nclt_circuit_closure_matches_survey():
    """Recompute the circuit-closure numbers recorded in SURVEY §6 from the
    shipped fixtures — validates both the loaders and the chain convention."""
    fgr = poses_io.load_reference_relative("FGR", "NCLT")
    gicp = poses_io.load_reference_relative("FGR_GICP", "NCLT")
    for poses, t_expect, r_expect in [(fgr, 104.39, 2.784), (gicp, 40.82, 0.320)]:
        closure = np.asarray(se3.loop_closure_error(poses))  # numpy f64 host path
        t_norm = np.linalg.norm(closure[:3, 3])
        r_norm = np.linalg.norm(closure[:3, :3] - np.eye(3))
        assert abs(t_norm - t_expect) / t_expect < 0.02, (t_norm, t_expect)
        assert abs(r_norm - r_expect) / r_expect < 0.05, (r_norm, r_expect)


def test_lazy_clouds_streaming():
    """LazyClouds: host iteration yields numpy-backed clouds (no device
    traffic for planners), indexing yields device clouds with LRU eviction,
    and indexed content matches the eager loader."""
    import numpy as np
    import jax.numpy as jnp

    from pcr_tpu.utils import cloud as cloud_mod

    lz = cloud_mod.load_dataset_lazy("Facade", indices=[0, 1, 2], keep=2)
    assert len(lz) == 3
    for h in lz:  # host side
        assert isinstance(h.points, np.ndarray) and isinstance(h.mask, np.ndarray)
    d0 = lz[0]
    assert isinstance(d0.points, jnp.ndarray)
    _ = lz[1]
    _ = lz[2]                       # evicts 0 (keep=2)
    assert 0 not in lz._cache and {1, 2} <= set(lz._cache)
    d0b = lz[0]                     # re-upload works
    eager = cloud_mod.load_dataset("Facade", indices=[0])[0]
    np.testing.assert_array_equal(np.asarray(d0b.points), np.asarray(eager.points))
    np.testing.assert_array_equal(np.asarray(d0b.mask), np.asarray(eager.mask))


def test_lazy_clouds_non_prefix_mask_falls_back():
    """_upload_prefix assumes valid rows form a prefix (true for both dataset
    loaders); a host cloud with interior mask holes must take the full-upload
    fallback and arrive on device bit-identical, not silently truncated."""
    import numpy as np
    import jax.numpy as jnp

    from pcr_tpu.utils import cloud as cloud_mod

    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    mask = np.ones(10, bool)
    mask[[2, 5]] = False  # interior holes: NOT a prefix mask
    holey = cloud_mod.Cloud(points=pts, mask=mask)
    lz = cloud_mod.LazyClouds([holey], keep=2)
    dev = lz[0]
    assert isinstance(dev.points, jnp.ndarray)
    np.testing.assert_array_equal(np.asarray(dev.points), pts)
    np.testing.assert_array_equal(np.asarray(dev.mask), mask)
    # and the prefix path itself (rows < capacity, real slice + device repad)
    # stays exact for a prefix mask
    cap, nv = 4096, 100
    big = np.full((cap, 3), cloud_mod.PAD_COORD, np.float32)
    big[:nv] = np.arange(3 * nv, dtype=np.float32).reshape(nv, 3)
    pref = cloud_mod.Cloud(points=big, mask=np.arange(cap) < nv)
    dev2 = cloud_mod.LazyClouds([pref], keep=2)[0]
    np.testing.assert_array_equal(np.asarray(dev2.mask), np.arange(cap) < nv)
    np.testing.assert_array_equal(np.asarray(dev2.points), big)
