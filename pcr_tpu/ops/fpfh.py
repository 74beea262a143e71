"""Fast Point Feature Histograms (SURVEY N6) — batched, fixed-shape.

Replaces ``o3d.pipelines.registration.compute_fpfh_feature`` with
Hybrid(radius=10*voxel, max_nn=200) search (reference call site
``1_FGR_pairwise_registration...py:48-50``).

Semantics follow Open3D's two-pass scheme:
  1. SPFH pass: for each point p with neighbors q != p, compute the Darboux
     pair features (f1 = alpha = v . n_q, f2 = phi = u . d/||d||,
     f3 = theta = atan2(w . n_q, u . n_q)) and accumulate three 11-bin
     histograms (33 dims), each increment = 100 / (num_neighbors - 1).
  2. FPFH pass: fpfh_i = spfh_i + normalize_i( sum_{q} spfh_q / ||p-q||^2 )
     where the weighted neighbor sum is renormalized per 11-bin block to sum
     to 100 before adding the own SPFH (this matches Open3D's
     ComputeFPFHFeature exactly, including the squared-distance weight).

Everything is dense gather + one-hot histogram accumulation — no scatter with
dynamic sizes, so it vectorizes cleanly over points and over scan pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import knn as knn_ops

N_BINS = 11
FEATURE_DIM = 33


def _pair_features(p, n_p, q, n_q):
    """Darboux-frame pair features between point sets.

    p, n_p: (N, 3); q, n_q: (N, K, 3). Returns f1, f2, f3 with shape (N, K).
    Mirrors Open3D's ComputePairFeatures source/target swap: the point whose
    normal has the smaller angle with the connecting line becomes the source.
    """
    d = q - p[:, None, :]                          # (N, K, 3)
    dist = jnp.linalg.norm(d, axis=-1)
    dn = d / jnp.maximum(dist[..., None], 1e-12)

    n1 = jnp.broadcast_to(n_p[:, None, :], q.shape)
    n2 = n_q
    # angle1 = n1 . dn ; angle2 = n2 . dn ; if |angle2| > |angle1| swap roles
    a1 = jnp.sum(n1 * dn, axis=-1)
    a2 = jnp.sum(n2 * dn, axis=-1)
    swap = jnp.abs(a2) > jnp.abs(a1)
    u = jnp.where(swap[..., None], n2, n1)
    nt = jnp.where(swap[..., None], n1, n2)
    dn_eff = jnp.where(swap[..., None], -dn, dn)
    f2 = jnp.sum(u * dn_eff, axis=-1)

    v = jnp.cross(dn_eff, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    w = jnp.cross(u, v)
    f1 = jnp.sum(v * nt, axis=-1)
    f3 = jnp.arctan2(jnp.sum(w * nt, axis=-1), jnp.sum(u * nt, axis=-1))
    return f1, f2, f3, dist


def _hist_accumulate(f, lo, hi, weights):
    """(N, K) features -> (N, 11) weighted histograms via one-hot matmul."""
    bins = jnp.floor(N_BINS * (f - lo) / (hi - lo)).astype(jnp.int32)
    bins = jnp.clip(bins, 0, N_BINS - 1)
    onehot = jax.nn.one_hot(bins, N_BINS, dtype=jnp.float32)  # (N, K, 11)
    return jnp.einsum("nk,nkb->nb", weights, onehot)


def _weighted_spfh_matmul(points, mask, spfh, tau, q_tile: int | None = None):
    """FPFH pass 2 as a tiled dense matmul (TPU path): for each query tile,
    rebuild the matmul-metric distance row, turn it into the weight row
    W_ij = 1/d2_ij gated by d2 <= tau_i (tau = min(selection's k-th distance,
    radius^2) — i.e. the same hybrid neighborhood the SPFH pass used), and
    contract W @ spfh on the MXU.

    This replaces a 33-wide row gather of ~N*max_nn rows (~80 ms at 32k/200 —
    XLA TPU row gathers run ~30 M rows/s) with ~2 HBM passes over the distance
    tiles plus a (q_tile, N) x (N, 33) matmul (~25 ms total).  Neighbors the
    approximate selection missed but that lie within tau are *included* here —
    a strict quality improvement over the gather formulation.
    """
    n = points.shape[0]
    if q_tile is None:
        # Cap the materialized W tile at ~256 MB (q_tile * n * 4B): 2048 rows
        # at the 32k NCLT bucket, 256 at the 245k Courtyard bucket; keep it a
        # multiple of 128 (sublane-friendly).
        q_tile = max(128, min(2048, ((1 << 26) // max(n, 1)) // 128 * 128))
    rp = jnp.where(mask[:, None], points, knn_ops.PAD_COORD)
    rn = jnp.sum(rp * rp, axis=1)
    n_pad = -(-n // q_tile) * q_tile
    qp = knn_ops._pad_rows(rp, n_pad, knn_ops.PAD_COORD)
    taup = knn_ops._pad_rows(tau, n_pad, 0.0)
    q_tiles = qp.reshape(n_pad // q_tile, q_tile, 3)
    t_tiles = taup.reshape(n_pad // q_tile, q_tile)
    i_tiles = jnp.arange(n_pad, dtype=jnp.int32).reshape(n_pad // q_tile, q_tile)
    col = jnp.arange(n, dtype=jnp.int32)

    def per_tile(tile):
        q, tq, qidx = tile
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        cross = jnp.dot(q, rp.T, preferred_element_type=jnp.float32)
        d2 = qn + rn[None, :] - 2.0 * cross
        # d2 > 0 drops exact duplicates (as the gather path's w_k>0 & d2_k>0
        # did); the explicit column test drops self even when cancellation
        # noise makes d2_ii slightly positive.
        keep = (d2 <= tq[:, None]) & (d2 > 0.0) & (col[None, :] != qidx[:, None])
        W = jnp.where(keep, 1.0 / jnp.maximum(d2, 1e-12), 0.0)
        return jnp.dot(W, spfh, preferred_element_type=jnp.float32)

    acc = jax.lax.map(per_tile, (q_tiles, t_tiles, i_tiles))
    return acc.reshape(n_pad, FEATURE_DIM)[:n]


@functools.partial(jax.jit, static_argnames=("max_nn", "nb_chunk"))
def fpfh(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mask: jnp.ndarray,
    radius,
    max_nn: int = 200,
    nb_chunk: int = 25,
    knn_result=None,
) -> jnp.ndarray:
    """Compute (N, 33) FPFH features with Hybrid(radius, max_nn) neighborhoods.

    Both accumulation passes scan over neighbor chunks of size ``nb_chunk`` so
    peak memory is O(N * nb_chunk) instead of O(N * max_nn * 33).

    ``knn_result`` — optional precomputed self-kNN ``(d2, idx)`` with
    exclude_self=True and >= max_nn ascending columns (the selection is the
    dominant FPFH cost; fgr_features shares one between normals and FPFH).
    """
    assert max_nn % nb_chunk == 0
    n = points.shape[0]
    if knn_result is None:
        # rescore=False: SPFH/FPFH weights are 1/d^2 over ~200 neighbors — the
        # matmul-metric's ~1e-3 m^2 cancellation error is noise there, and the
        # exact-rescore gather costs ~0.2 s per 32k cloud (see knn_approx).
        d2, idx = knn_ops.knn(points, points, mask, max_nn, exclude_self=True,
                              rescore=False)
    else:
        d2, idx = knn_result
        d2, idx = d2[:, :max_nn], idx[:, :max_nn]
    valid = (d2 <= jnp.float32(radius) ** 2) & mask[:, None] & (d2 < knn_ops.BIG)

    w = valid.astype(jnp.float32)
    counts = jnp.sum(w, axis=1)
    hist_incr = jnp.where(counts > 0, 100.0 / jnp.maximum(counts, 1.0), 0.0)

    n_chunks = max_nn // nb_chunk
    idx_c = jnp.moveaxis(idx.reshape(n, n_chunks, nb_chunk), 1, 0)      # (C, N, k)
    w_c = jnp.moveaxis(w.reshape(n, n_chunks, nb_chunk), 1, 0)
    d2_c = jnp.moveaxis(d2.reshape(n, n_chunks, nb_chunk), 1, 0)

    # One fused (N, 6) table: TPU row gathers cost per ROW (~30 M rows/s),
    # not per byte, so gathering points+normals together halves the SPFH
    # pass's gather rows vs two separate (N, 3) gathers.
    pn = jnp.concatenate([points, normals], axis=1)

    def spfh_chunk(acc, inp):
        idx_k, w_k = inp
        nb = pn[idx_k]
        nb_pts, nb_normals = nb[..., :3], nb[..., 3:]
        f1, f2, f3, _ = _pair_features(points, normals, nb_pts, nb_normals)
        wh = w_k * hist_incr[:, None]
        acc = acc + jnp.concatenate(
            [
                _hist_accumulate(f1, -1.0, 1.0, wh),
                _hist_accumulate(f2, -1.0, 1.0, wh),
                _hist_accumulate(f3, -jnp.pi, jnp.pi, wh),
            ],
            axis=1,
        )
        return acc, None

    spfh, _ = jax.lax.scan(spfh_chunk, jnp.zeros((n, FEATURE_DIM), jnp.float32), (idx_c, w_c))

    # FPFH pass: weighted neighbor SPFH sum, weight = 1/squared-distance.
    # TPU: tiled dense matmul (gather-free, see _weighted_spfh_matmul);
    # elsewhere: chunked gather (dense tiles would be O(N^2) CPU FLOPs).
    if jax.default_backend() == "tpu":
        tau = jnp.minimum(d2[:, -1], jnp.float32(radius) ** 2)
        acc = _weighted_spfh_matmul(points, mask, spfh, tau)
    else:
        def fpfh_chunk(acc, inp):
            idx_k, w_k, d2_k = inp
            inv = jnp.where((w_k > 0) & (d2_k > 0), 1.0 / jnp.maximum(d2_k, 1e-12), 0.0)
            acc = acc + jnp.einsum("nk,nkf->nf", inv, spfh[idx_k])
            return acc, None

        acc, _ = jax.lax.scan(
            fpfh_chunk, jnp.zeros((n, FEATURE_DIM), jnp.float32), (idx_c, w_c, d2_c)
        )
    # Per-11-bin-block renormalization to 100 (Open3D's sum[j/11] scheme)
    blocks = acc.reshape(-1, 3, N_BINS)
    sums = jnp.sum(blocks, axis=-1, keepdims=True)
    blocks = jnp.where(sums > 0, blocks * (100.0 / jnp.maximum(sums, 1e-12)), 0.0)
    out = blocks.reshape(-1, FEATURE_DIM) + spfh
    return jnp.where(mask[:, None], out, 0.0)
