"""Hash-grid NN tests: exactness within radius vs brute force."""

import numpy as np
import jax.numpy as jnp

from pcr_tpu.ops import grid_nn, knn
from pcr_tpu.utils import cloud


def test_grid_nn1_matches_exact(rng):
    pts = rng.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
    q = rng.uniform(-5, 5, size=(1500, 3)).astype(np.float32)
    c = cloud.from_numpy(pts, capacity=2048)
    max_dist = 0.5
    grid = grid_nn.build_grid(c.points, c.mask, max_dist)
    d_g, i_g = grid_nn.nn1_grid(grid, jnp.asarray(q), max_dist, q_tile=512)
    d_e, i_e = knn.nn1_exact(jnp.asarray(q), c.points, c.mask)
    d_g, i_g, d_e, i_e = map(np.asarray, (d_g, i_g, d_e, i_e))
    in_range = d_e <= max_dist**2
    np.testing.assert_array_equal(i_g[in_range], i_e[in_range])
    np.testing.assert_allclose(d_g[in_range], d_e[in_range], rtol=1e-6)
    # out-of-range queries flagged BIG
    assert (d_g[~in_range] >= grid_nn.BIG).all()


def test_grid_respects_mask(rng):
    pts = rng.uniform(-2, 2, size=(300, 3)).astype(np.float32)
    c = cloud.from_numpy(pts, capacity=512)  # 212 padded points at sentinel
    grid = grid_nn.build_grid(c.points, c.mask, 0.5)
    d, i = grid_nn.nn1_grid(grid, c.points[:300], 0.5)
    assert np.asarray(i).max() < 300
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)  # self-match


def test_grid_dense_cluster_overflow_tolerance(rng):
    """A pathological cluster denser than k_cap still returns *a* valid
    neighbor within range (the documented approximation)."""
    pts = (rng.normal(size=(500, 3)) * 0.01).astype(np.float32)  # all in one cell
    c = cloud.from_numpy(pts, capacity=512)
    grid = grid_nn.build_grid(c.points, c.mask, 1.0)
    d, i = grid_nn.nn1_grid(grid, c.points[:500], 1.0, k_cap=32)
    d = np.asarray(d)
    assert (d <= 1.0).all()  # some in-range neighbor found for every query
