"""Multi-scale GICP pyramid (SURVEY P4) and scale schedules.

Replaces ``Multiscale_GICP`` — the canonical linear-scale variant of
``2_MGICP_refinement...py:128-164`` and the doubling-scale variant of
``ALL_FUNCTIONS.py:272-313`` — as a jit-compiled coarse-to-fine loop:

  per scale (coarse -> fine), warm-started from the previous scale:
    voxel_down_sample(v_s) -> remove_statistical_outlier(30, 1.0)
    -> estimate_normals(KNN 20) -> GICP(L1 loss, <=100 iters,
       rel_fitness=rel_rmse=1e-6) at search radius schedule
       [3, 2.5, 2, 1.5, 1] * scales (2_...py:112-120)

The python loop over scales unrolls into one XLA program (static scale count);
each scale optionally compacts the downsampled cloud into a smaller static
capacity so the O(N^2) correspondence kernel runs at the true point count, not
the padded capacity — the TPU-first answer to Open3D's dynamic resizing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import normals as normals_ops
from ..ops import outlier as outlier_ops
from ..ops import preprocess as preprocess_ops
from ..ops import voxel as voxel_ops
from ..utils.cloud import Cloud, compact
from . import gicp as gicp_mod


def create_scales(n_scales: int) -> list[float]:
    """Linear schedule of 2_...py:102-106: n=5 -> [0.5, 0.4, 0.3, 0.2, 0.1]."""
    return [0.1 + 0.1 * i for i in reversed(range(n_scales))]


def create_scales_doubling(n_scales: int) -> list[float]:
    """Doubling schedule of ALL_FUNCTIONS.py:260-264 (reversed coarse->fine):
    n=3 -> [0.4, 0.2, 0.1]."""
    return [0.1 * 2**i for i in reversed(range(n_scales))]


def max_correspondence_distances(scales: list[float]) -> list[float]:
    """Search-radius schedule of 2_...py:112-120 (exact factors for the
    reference's n in {3, 4, 5}; linear 3 -> 1 interpolation otherwise)."""
    n = len(scales)
    table = {3: [3.0, 2.0, 1.0], 4: [3.0, 2.5, 2.0, 1.0], 5: [3.0, 2.5, 2.0, 1.5, 1.0]}
    if n in table:
        factors = table[n]
    elif n == 1:
        factors = [1.0]
    else:
        factors = [3.0 - 2.0 * i / (n - 1) for i in range(n)]
    return [f * s for f, s in zip(factors, scales)]


def radius_from_cloud_pair(source: Cloud, target: Cloud) -> jnp.ndarray:
    """Geometric-mean extent radius (ALL_FUNCTIONS.py:1092-1101)."""
    def rad(c: Cloud):
        big = jnp.float32(3e38)
        mx = jnp.max(jnp.where(c.mask[:, None], c.points, -big), axis=0)
        mn = jnp.min(jnp.where(c.mask[:, None], c.points, big), axis=0)
        d = mx - mn
        return (d[0] * d[1] * d[2]) ** (1.0 / 3.0)

    return (rad(source) + rad(target)) / 2.0


def _preprocess_scale(c: Cloud, voxel_size: float, scale_capacity: int | None,
                      knn_filter: int = 30, std_filter: float = 1.0,
                      normal_knn: int = 20, fused: bool = True) -> Cloud:
    if fused:
        # One shared top-31 search, no scatters; output in sorted-axis order
        # (Clouds are orderless sets — see ops/preprocess.py for the exact
        # deviation from the ops/outlier.py + ops/normals.py chain).
        return preprocess_ops.preprocess_scale_fused(
            c, voxel_size, scale_capacity, knn_filter, std_filter, normal_knn)
    d = voxel_ops.voxel_downsample_cloud(c, voxel_size)
    if scale_capacity is not None and scale_capacity < d.capacity:
        d = compact(d, scale_capacity)  # voxel output is prefix-compact already
    d = outlier_ops.remove_statistical_outliers(d, knn_filter, std_filter)
    return normals_ops.with_normals_knn(d, normal_knn)


@functools.partial(
    jax.jit,
    static_argnames=("n_scales", "iterations", "loss", "scale_capacities", "fused"),
)
def build_pyramid(
    c: Cloud,
    n_scales: int = 5,
    iterations: int = 0,  # unused; kept for config symmetry
    loss: str = "l1",
    scale_capacities: tuple[int, ...] | None = None,
    fused: bool = True,
) -> tuple[Cloud, ...]:
    """Per-cloud preprocessing pyramid (linear schedule): downsample + filter
    + normals at every scale, computed ONCE per cloud.

    In a circuit every cloud serves as source of one pair and target of the
    next; precomputing pyramids halves stage-2 preprocessing (the dominant
    cost after the band correspondence search).
    """
    scales = create_scales(n_scales)
    out = []
    for s in range(n_scales):
        cap = scale_capacities[s] if scale_capacities is not None else None
        out.append(_preprocess_scale(c, scales[s], cap, fused=fused))
    return tuple(out)


@functools.partial(
    jax.jit, static_argnames=("n_scales", "iterations", "loss")
)
def multiscale_gicp_pyramids(
    src_pyr: tuple[Cloud, ...],
    tgt_pyr: tuple[Cloud, ...],
    T_init,
    n_scales: int = 5,
    iterations: int = 100,
    loss: str = "l1",
) -> gicp_mod.RegistrationResult:
    """M-GICP over precomputed pyramids (linear schedule)."""
    scales = create_scales(n_scales)
    dists = [jnp.float32(d) for d in max_correspondence_distances(scales)]
    T = jnp.asarray(T_init, jnp.float32)
    result = None
    for s in range(n_scales):
        result = gicp_mod.registration_gicp(
            src_pyr[s], tgt_pyr[s], dists[s], T, loss=loss, max_iteration=iterations,
        )
        T = result.transformation
    return result


@functools.partial(
    jax.jit,
    static_argnames=("n_scales", "iterations", "loss", "scale_capacities",
                     "schedule", "fused"),
)
def multiscale_gicp(
    source: Cloud,
    target: Cloud,
    T_init,
    n_scales: int = 5,
    iterations: int = 100,
    loss: str = "l1",
    scale_capacities: tuple[int, ...] | None = None,
    schedule: str = "linear",
    fused: bool = True,
) -> gicp_mod.RegistrationResult:
    """M-GICP with the reference's stage-2 defaults (n=5, 100 iters, L1).

    ``schedule='linear'`` is the canonical 2_...py variant;
    ``schedule='doubling'`` is the ALL_FUNCTIONS variant whose search radii
    derive from the cloud extents (used by Coarse_to_fine, SURVEY P5).
    """
    if schedule == "linear":
        scales = create_scales(n_scales)
        dists = [jnp.float32(d) for d in max_correspondence_distances(scales)]
    elif schedule == "doubling":
        scales = create_scales_doubling(n_scales)
        base = radius_from_cloud_pair(source, target)
        # Deliberate deviation from ALL_FUNCTIONS.py:276-278, which uses the
        # raw extent radius (tens of meters for TLS scans) as the first-scale
        # correspondence cap: at that distance every source point matches
        # SOMETHING, and on partial-overlap pairs the robust GN walks a
        # correct seed into a wrong basin (measured: Facade s0->s1 at 16k
        # pts, FGR pose 0.20 m from the fixture, refined to 24 m off under a
        # 34.8 m cap).  Clamp each scale's cap to 10x its voxel — same order
        # as the canonical linear schedule's 3-10x voxel ratios (2_...py:
        # 112-120) — which keeps the extent-derived schedule for small scenes
        # and bounds it for large ones.
        dists = [jnp.minimum(base * (2.0 ** (-i)), 10.0 * scales[i])
                 for i in range(n_scales)]
    else:
        raise ValueError(f"unknown schedule {schedule!r}")

    T = jnp.asarray(T_init, jnp.float32)
    result = None
    for s in range(n_scales):
        cap = scale_capacities[s] if scale_capacities is not None else None
        src_s = _preprocess_scale(source, scales[s], cap, fused=fused)
        tgt_s = _preprocess_scale(target, scales[s], cap, fused=fused)
        result = gicp_mod.registration_gicp(
            src_s, tgt_s, dists[s], T,
            loss=loss, max_iteration=iterations,
        )
        T = result.transformation
    return result
