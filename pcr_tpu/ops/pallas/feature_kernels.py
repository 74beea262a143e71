"""Pallas TPU kernels for the banded stage-1 features (VERDICT r4 item 3).

The XLA banded path (``ops.fpfh_sorted``) runs three ``lax.map`` passes over
query tiles — normals moments, SPFH, FPFH — each materializing its (TQ, 2B)
distance tile and its Darboux pair-feature temporaries through the XLA fusion
boundary.  Here each pass is ONE Pallas kernel: the distance tile lives in a
VMEM scratch across the count-CDF bisection AND its consumer reduction, band
slabs are DMA-steered by the scalar-prefetched slab starts (no gathered slab
arrays in HBM), and the weighted reductions (moments, FPFH neighbor sum) run
on the MXU against in-VMEM payload slabs.

Math notes vs the XLA twin (same semantics, same tolerances):

* Mosaic has no atan2/atan lowering, so the f3 = atan2(w.nt, u.nt) histogram
  is binned WITHOUT evaluating the angle: with r = |(c, s)|, the CDF test
  theta >= theta_k over theta in (-pi, pi] is exactly
      theta_k > 0:  s >= 0  AND  c <= cos(theta_k) * r
      theta_k = 0:  s >= 0
      theta_k < 0:  s >= 0  OR   c >= cos(theta_k) * r
  (cosine is monotone decreasing on [0, pi] and increasing on [-pi, 0]).
  The f1/f2 bins use the same CDF trick (count of thresholds <= f), which
  equals the floor-based binning of the XLA path up to f32 ties.
* Histograms accumulate RAW counts per query and scale by 100/count once at
  the end (the XLA path weights each pair first — same result).

Layout follows ops/pallas/nn_kernels: point/normal arrays enter TRANSPOSED
(3, N) so only the sublane dim pads; SPFH slabs stay (N, 33) (lane dim pads
33 -> 128 in VMEM, 2 MB per 4096-row slab).

Reference: Open3D ``compute_fpfh_feature`` Hybrid(10v, 200) +
``estimate_normals`` Hybrid(2v, 20) at ``1_...py:44-50``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BINS = 11
FEATURE_DIM = 33
REAL_D2_MAX = 1.0e10


def _bisect_tau(d2, real, k: int, log_lo: float, log_hi: float,
                steps: int = 10):
    """Per-query threshold tau with count(d2 <= tau) >= k via log-space
    bisection over the resident (TQ, 2B) distance tile (identical math to
    ops.fpfh_sorted._bisect_tau_local)."""
    shape = d2.shape[:-1]
    llo = jnp.full(shape, jnp.float32(log_lo))
    lhi = jnp.full(shape, jnp.float32(log_hi))
    for _ in range(steps):
        lmid = 0.5 * (llo + lhi)
        c = jnp.sum(
            jnp.where(real & (d2 <= jnp.exp(lmid)[:, None]), 1.0, 0.0),
            axis=-1)
        geq = c >= k
        llo = jnp.where(geq, llo, lmid)
        lhi = jnp.where(geq, lmid, lhi)
    return jnp.exp(lhi)


def _d2_half(q, r):
    """(TQ, band) squared-distance half-tile from transposed blocks."""
    qn = jnp.sum(q * q, axis=0)
    rn = jnp.sum(r * r, axis=0)
    cross = jax.lax.dot_general(
        q, r, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return qn[:, None] + rn[None, :] - 2.0 * cross


# ---------------------------------------------------------------------------
# Pass 1 — normals moments: Hybrid(2v, k) binary weights @ feats10
# ---------------------------------------------------------------------------

def _moments_kernel(s_ref, q_ref, r_ref, out_ref, d2_sc, r_sc, *,
                    band: int, normal_k: int, log_lo: float, log_hi: float):
    c = pl.program_id(1)
    q = q_ref[:]                                         # (3, TQ)
    r = r_ref[:]                                         # (3, band)
    d2_sc[:, pl.ds(c * band, band)] = _d2_half(q, r)
    r_sc[:, pl.ds(c * band, band)] = r

    @pl.when(c == 1)
    def _():
        d2 = d2_sc[:, :]                                 # (TQ, 2B)
        rr = r_sc[:, :]                                  # (3, 2B)
        rn2 = jnp.sum(rr * rr, axis=0)                   # (2B,)
        real = (rn2 < REAL_D2_MAX)[None, :]
        realf = jnp.where(rn2 < REAL_D2_MAX, 1.0, 0.0)
        tau = _bisect_tau(d2, real, normal_k, log_lo, log_hi)
        w = jnp.where(real & (d2 <= tau[:, None]), 1.0, 0.0)   # (TQ, 2B)
        cnt_r = jnp.maximum(jnp.sum(realf), 1.0)
        center = jnp.sum(rr * realf[None, :], axis=1) / cnt_r  # (3,)
        bc = rr - center[:, None]                        # (3, 2B)
        x, y, z = bc[0], bc[1], bc[2]
        ones = jnp.ones_like(x)
        zero = jnp.zeros_like(x)
        # 10 real moment columns + 6 zero pads = the (TQ, 16) out block
        feats16 = jnp.stack(
            [x, y, z, x * x, x * y, x * z, y * y, y * z, z * z, ones,
             zero, zero, zero, zero, zero, zero],
            axis=0)                                      # (16, 2B)
        out_ref[:, :] = jax.lax.dot_general(
            w, feats16, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (TQ, 16)


@functools.partial(jax.jit, static_argnames=(
    "voxel_size", "q_tile", "band", "normal_k", "interpret"))
def moments_pallas(starts_blk, qT, rT, voxel_size, *, q_tile: int,
                   band: int, normal_k: int = 20, interpret: bool = False):
    """(n_pad, 10) banded neighborhood moments [sum x | sum xx^T | count] with
    Hybrid(2*voxel, normal_k) neighborhoods — pass 1 of the banded features."""
    n_pad = qT.shape[1]
    n_tiles = n_pad // q_tile
    v = float(voxel_size)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, 2),
        in_specs=[
            pl.BlockSpec((3, q_tile), lambda g, c, s: (0, g)),
            pl.BlockSpec((3, band), lambda g, c, s: (0, s[g] + c)),
        ],
        out_specs=pl.BlockSpec((q_tile, 16), lambda g, c, s: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((q_tile, 2 * band), jnp.float32),
            pltpu.VMEM((3, 2 * band), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _moments_kernel, band=band, normal_k=normal_k,
            log_lo=2.0 * math.log(0.05 * v), log_hi=2.0 * math.log(2.0 * v)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 16), jnp.float32),
        interpret=interpret,
    )(starts_blk, qT, rT)
    return out[:, :10]


# ---------------------------------------------------------------------------
# Pass 2 — SPFH: Darboux pair features + 11-bin CDF histograms
# ---------------------------------------------------------------------------

def _f12_thresholds():
    """f1/f2 in [-1, 1]: CDF thresholds t_k = -1 + 2k/11, k = 1..10."""
    return [(-1.0 + 2.0 * k / N_BINS) for k in range(1, N_BINS)]


def _f3_cdf_masks(s, c, r):
    """10 CDF masks 1[atan2(s, c) >= theta_k], theta_k = -pi + 2 pi k / 11,
    k = 1..10, via the half-plane + cosine-threshold tests (no atan2)."""
    masks = []
    s_pos = s >= 0.0
    for k in range(1, N_BINS):
        th = -math.pi + 2.0 * math.pi * k / N_BINS
        ck = math.cos(th)
        if th < 0.0:
            masks.append(s_pos | (c >= ck * r))
        else:
            masks.append(s_pos & (c <= ck * r))
    return masks


def _spfh_kernel(s_ref, q_ref, nq_ref, r_ref, nr_ref, out_ref, tau_ref,
                 d2_sc, r_sc, nr_sc, *, q_tile: int, band: int,
                 max_nn: int, radius2: float, log_lo: float, log_hi: float,
                 sub_chunk: int):
    g = pl.program_id(0)
    c = pl.program_id(1)
    q = q_ref[:]                                          # (3, TQ)
    d2_sc[:, pl.ds(c * band, band)] = _d2_half(q, r_ref[:])
    r_sc[:, pl.ds(c * band, band)] = r_ref[:]
    nr_sc[:, pl.ds(c * band, band)] = nr_ref[:]

    @pl.when(c == 1)
    def _():
        d2 = d2_sc[:, :]
        rr = r_sc[:, :]
        rn2 = jnp.sum(rr * rr, axis=0)
        real = (rn2 < REAL_D2_MAX)[None, :]
        tau = jnp.minimum(
            _bisect_tau(d2, real, max_nn + 1, log_lo, log_hi),
            jnp.float32(radius2))
        # self-exclusion: this tile's query t sits at band column
        # g*TQ + t - starts_el (ops/fpfh_sorted self_col)
        starts_el = s_ref[g] * band
        self_col = (g * q_tile + jax.lax.broadcasted_iota(
            jnp.int32, (q_tile, 1), 0) - starts_el)       # (TQ, 1)
        band_col = jax.lax.broadcasted_iota(
            jnp.int32, (q_tile, 2 * band), 1)
        keep = (real & (d2 <= tau[:, None]) & (d2 > 0.0)
                & (band_col != self_col))
        keepf = jnp.where(keep, 1.0, 0.0)
        cnt = jnp.sum(keepf, axis=1)                      # (TQ,)
        nq = nq_ref[:]                                    # (3, TQ)

        n_sub = (2 * band) // sub_chunk
        cdf = None
        for sidx in range(n_sub):                         # static unroll
            sl = slice(sidx * sub_chunk, (sidx + 1) * sub_chunk)
            b = r_sc[:, sl]                               # (3, SC)
            nb = nr_sc[:, sl]
            w = jnp.where(keep[:, sl], 1.0, 0.0)          # (TQ, SC)
            # pair geometry (components kept separate: (TQ, SC) lanes)
            dx = b[0][None, :] - q[0][:, None]
            dy = b[1][None, :] - q[1][:, None]
            dz = b[2][None, :] - q[2][:, None]
            dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            inv = 1.0 / jnp.maximum(dist, 1e-12)
            dnx, dny, dnz = dx * inv, dy * inv, dz * inv
            n1x, n1y, n1z = (nq[0][:, None], nq[1][:, None], nq[2][:, None])
            n2x, n2y, n2z = nb[0][None, :], nb[1][None, :], nb[2][None, :]
            a1 = n1x * dnx + n1y * dny + n1z * dnz
            a2 = n2x * dnx + n2y * dny + n2z * dnz
            swap = jnp.abs(a2) > jnp.abs(a1)
            ux = jnp.where(swap, n2x, n1x * jnp.ones_like(a1))
            uy = jnp.where(swap, n2y, n1y * jnp.ones_like(a1))
            uz = jnp.where(swap, n2z, n1z * jnp.ones_like(a1))
            ntx = jnp.where(swap, n1x * jnp.ones_like(a1), n2x * jnp.ones_like(a1))
            nty = jnp.where(swap, n1y * jnp.ones_like(a1), n2y * jnp.ones_like(a1))
            ntz = jnp.where(swap, n1z * jnp.ones_like(a1), n2z * jnp.ones_like(a1))
            sgn = jnp.where(swap, -1.0, 1.0)
            ex, ey, ez = sgn * dnx, sgn * dny, sgn * dnz  # dn_eff
            f2 = ux * ex + uy * ey + uz * ez
            # v = cross(dn_eff, u), normalized; w = cross(u, v)
            vx = ey * uz - ez * uy
            vy = ez * ux - ex * uz
            vz = ex * uy - ey * ux
            vinv = jax.lax.rsqrt(
                jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-24))
            vx, vy, vz = vx * vinv, vy * vinv, vz * vinv
            wx = uy * vz - uz * vy
            wy = uz * vx - ux * vz
            wz = ux * vy - uy * vx
            f1 = vx * ntx + vy * nty + vz * ntz
            # f3 = atan2(sa, ca) binned via half-plane/cosine tests
            sa = wx * ntx + wy * nty + wz * ntz
            ca = ux * ntx + uy * nty + uz * ntz
            ra = jnp.sqrt(sa * sa + ca * ca)
            cols = [jnp.sum(w, axis=1)]                   # cdf_0(f1) = cnt
            for t in _f12_thresholds():
                cols.append(jnp.sum(jnp.where(f1 >= t, w, 0.0), axis=1))
            cols.append(jnp.sum(w, axis=1))               # cdf_0(f2)
            for t in _f12_thresholds():
                cols.append(jnp.sum(jnp.where(f2 >= t, w, 0.0), axis=1))
            cols.append(jnp.sum(w, axis=1))               # cdf_0(f3)
            for m in _f3_cdf_masks(sa, ca, ra):
                cols.append(jnp.sum(jnp.where(m, w, 0.0), axis=1))
            part = jnp.stack(cols, axis=1)                # (TQ, 33)
            cdf = part if cdf is None else cdf + part

        # cdf -> per-bin counts: bin_b = cdf_b - cdf_{b+1} (cdf_11 = 0)
        shifted = jnp.concatenate(
            [cdf[:, 1:N_BINS], jnp.zeros((q_tile, 1), jnp.float32),
             cdf[:, N_BINS + 1:2 * N_BINS], jnp.zeros((q_tile, 1), jnp.float32),
             cdf[:, 2 * N_BINS + 1:], jnp.zeros((q_tile, 1), jnp.float32)],
            axis=1)
        hist = cdf - shifted
        incr = jnp.where(cnt > 0, 100.0 / jnp.maximum(cnt, 1.0), 0.0)
        pad = jnp.zeros((q_tile, 16 * ((FEATURE_DIM + 15) // 16) - FEATURE_DIM),
                        jnp.float32)
        out_ref[:, :] = jnp.concatenate([hist * incr[:, None], pad], axis=1)
        tau_ref[:, :] = tau.reshape(q_tile, 1)


@functools.partial(jax.jit, static_argnames=(
    "voxel_size", "q_tile", "band", "max_nn", "sub_chunk", "interpret"))
def spfh_pallas(starts_blk, qT, nqT, rT, nrT, voxel_size, *, q_tile: int,
                band: int, max_nn: int = 200, sub_chunk: int = 512,
                interpret: bool = False):
    """(spfh (n_pad, 33), tau (n_pad,)) — pass 2 of the banded features:
    Hybrid(10v, max_nn excl self) SPFH histograms, distance tile resident in
    VMEM across bisection + histogramming."""
    n_pad = qT.shape[1]
    n_tiles = n_pad // q_tile
    v = float(voxel_size)
    sc = min(sub_chunk, 2 * band)
    out_cols = 16 * ((FEATURE_DIM + 15) // 16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, 2),
        in_specs=[
            pl.BlockSpec((3, q_tile), lambda g, c, s: (0, g)),
            pl.BlockSpec((3, q_tile), lambda g, c, s: (0, g)),
            pl.BlockSpec((3, band), lambda g, c, s: (0, s[g] + c)),
            pl.BlockSpec((3, band), lambda g, c, s: (0, s[g] + c)),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, out_cols), lambda g, c, s: (g, 0)),
            pl.BlockSpec((q_tile, 1), lambda g, c, s: (g, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, 2 * band), jnp.float32),
            pltpu.VMEM((3, 2 * band), jnp.float32),
            pltpu.VMEM((3, 2 * band), jnp.float32),
        ],
    )
    spfh, tau = pl.pallas_call(
        functools.partial(
            _spfh_kernel, q_tile=q_tile, band=band, max_nn=max_nn,
            radius2=(10.0 * v) ** 2, log_lo=2.0 * math.log(0.05 * v),
            log_hi=2.0 * math.log(10.0 * v), sub_chunk=sc),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, out_cols), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(starts_blk, qT, nqT, rT, nrT)
    return spfh[:, :FEATURE_DIM], tau.reshape(n_pad)


# ---------------------------------------------------------------------------
# Pass 3 — FPFH: 1/d2-weighted neighbor SPFH sum (MXU matmul vs the slab)
# ---------------------------------------------------------------------------

def _fpfh_kernel(s_ref, q_ref, tau_ref, r_ref, spfh_ref, out_ref,
                 d2_sc, r_sc, spfh_sc, *, q_tile: int, band: int,
                 sub_chunk: int):
    g = pl.program_id(0)
    c = pl.program_id(1)
    q = q_ref[:]
    d2_sc[:, pl.ds(c * band, band)] = _d2_half(q, r_ref[:])
    r_sc[:, pl.ds(c * band, band)] = r_ref[:]
    spfh_sc[pl.ds(c * band, band), :] = spfh_ref[:]

    @pl.when(c == 1)
    def _():
        d2 = d2_sc[:, :]
        rr = r_sc[:, :]
        rn2 = jnp.sum(rr * rr, axis=0)
        real = (rn2 < REAL_D2_MAX)[None, :]
        tau = tau_ref[:, :].reshape(q_tile)
        starts_el = s_ref[g] * band
        self_col = (g * q_tile + jax.lax.broadcasted_iota(
            jnp.int32, (q_tile, 1), 0) - starts_el)
        band_col = jax.lax.broadcasted_iota(
            jnp.int32, (q_tile, 2 * band), 1)
        keep = (real & (d2 <= tau[:, None]) & (d2 > 0.0)
                & (band_col != self_col))

        n_sub = (2 * band) // sub_chunk
        acc = None
        for sidx in range(n_sub):                         # static unroll
            sl = slice(sidx * sub_chunk, (sidx + 1) * sub_chunk)
            W = jnp.where(keep[:, sl],
                          1.0 / jnp.maximum(d2[:, sl], 1e-12), 0.0)
            part = jax.lax.dot_general(
                W, spfh_sc[sl, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (TQ, 33pad)
            acc = part if acc is None else acc + part
        out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=(
    "q_tile", "band", "sub_chunk", "interpret"))
def fpfh_pallas(starts_blk, qT, rT, tau, spfh, *, q_tile: int, band: int,
                sub_chunk: int = 1024, interpret: bool = False):
    """(n_pad, 33) weighted neighbor SPFH sums — pass 3 of the banded
    features (the caller adds the query's own SPFH and normalizes blocks)."""
    n_pad = qT.shape[1]
    nr_pad = rT.shape[1]
    n_tiles = n_pad // q_tile
    sc = min(sub_chunk, 2 * band)
    out_cols = 16 * ((FEATURE_DIM + 15) // 16)
    spfh_padded = jnp.pad(
        spfh, ((0, nr_pad - spfh.shape[0]), (0, out_cols - FEATURE_DIM)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, 2),
        in_specs=[
            pl.BlockSpec((3, q_tile), lambda g, c, s: (0, g)),
            pl.BlockSpec((q_tile, 1), lambda g, c, s: (g, 0)),
            pl.BlockSpec((3, band), lambda g, c, s: (0, s[g] + c)),
            pl.BlockSpec((band, out_cols), lambda g, c, s: (s[g] + c, 0)),
        ],
        out_specs=pl.BlockSpec((q_tile, out_cols), lambda g, c, s: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((q_tile, 2 * band), jnp.float32),
            pltpu.VMEM((3, 2 * band), jnp.float32),
            pltpu.VMEM((2 * band, out_cols), jnp.float32),
        ],
    )
    acc = pl.pallas_call(
        functools.partial(
            _fpfh_kernel, q_tile=q_tile, band=band, sub_chunk=sc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, out_cols), jnp.float32),
        interpret=interpret,
    )(starts_blk, qT, tau.reshape(n_pad, 1), rT, spfh_padded)
    return acc[:, :FEATURE_DIM]
