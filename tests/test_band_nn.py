"""Band NN tests: exactness vs brute force, stale-grouping robustness."""

import numpy as np
import jax.numpy as jnp

from pcr_tpu.ops import band_nn, knn
from pcr_tpu.utils import cloud, se3


def test_band_matches_exact(rng):
    pts = rng.uniform(-5, 5, size=(1800, 3)).astype(np.float32)
    q = rng.uniform(-5, 5, size=(1500, 3)).astype(np.float32)
    c = cloud.from_numpy(pts, capacity=2048)
    cq = cloud.from_numpy(q, capacity=2048)
    d_b, i_b = band_nn.nn1_band(cq.points, cq.mask, c.points, c.mask, 0.5,
                                q_tile=256, band=512)
    d_e, i_e = knn.nn1_exact(cq.points, c.points, c.mask)
    d_b, i_b, d_e, i_e = map(np.asarray, (d_b, i_b, d_e, i_e))
    in_r = (d_e <= 0.25) & np.asarray(cq.mask)
    np.testing.assert_array_equal(i_b[in_r], i_e[in_r])
    np.testing.assert_allclose(d_b[in_r], d_e[in_r], rtol=1e-6)
    assert (d_b[~in_r & np.asarray(cq.mask)] >= band_nn.BIG).all()


def test_band_query_with_stale_grouping(rng):
    """Query grouping built at one pose stays exact after a rigid motion
    (band bounds recompute from current coordinates)."""
    pts = rng.uniform(-5, 5, size=(1500, 3)).astype(np.float32)
    c = cloud.from_numpy(pts, capacity=2048)
    src = cloud.from_numpy(rng.uniform(-5, 5, size=(1400, 3)).astype(np.float32),
                           capacity=2048)
    index = band_nn.build_band_index(src.points, src.mask, c.points, c.mask,
                                     q_tile=256, band=512)
    # move the queries by a rigid transform (~0.3 m) after building the index
    xi = jnp.asarray(np.array([0.02, -0.01, 0.03, 0.2, -0.15, 0.1], np.float32))
    T = se3.se3_exp(xi)
    moved = se3.transform_points(T, src.points)
    d_b, i_b = band_nn.nn1_band_query(index, moved, src.mask, 0.5,
                                      q_tile=256, band=512)
    d_e, i_e = knn.nn1_exact(moved, c.points, c.mask)
    d_b, i_b, d_e, i_e = map(np.asarray, (d_b, i_b, d_e, i_e))
    in_r = (d_e <= 0.25) & np.asarray(src.mask)
    np.testing.assert_array_equal(i_b[in_r], i_e[in_r])


def test_band_respects_masks(rng):
    pts = rng.uniform(-2, 2, size=(300, 3)).astype(np.float32)
    c = cloud.from_numpy(pts, capacity=512)
    d, i = band_nn.nn1_band(c.points, c.mask, c.points, c.mask, 0.5,
                            q_tile=128, band=256)
    i = np.asarray(i)[np.asarray(c.mask)]
    assert i.max() < 300  # never a padded index
    np.testing.assert_allclose(np.asarray(d)[np.asarray(c.mask)], 0.0, atol=1e-6)
