"""k-connectivity pose-graph builder (SURVEY P5/P6) — the reference's
``full_registration`` (ALL_FUNCTIONS.py:342-394) and
``Coarse_to_fine_FGR_M_GICP`` (ALL_FUNCTIONS.py:317-332).

Registers each cloud against its next k neighbors: odometry edges
(target == source+1, uncertain=False, nodes accumulate inv(odometry)) and
loop-closure edges (source+1 < target <= source+k, uncertain=True), with the
fitness > 0.40 success gate.  k(2n-k-1)/2 edges for n clouds.

Each pair runs the coarse-to-fine pipeline: FGR (ALL_FUNCTIONS variant,
use_absolute_scale=True) -> 3-scale doubling M-GICP (100 iters/scale) ->
information matrix at the refined pose.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import se3
from ..utils.cloud import Cloud
from . import evaluate as eval_mod
from . import fgr as fgr_mod
from . import multiscale as ms_mod
from .global_refine import pose_graph as pg_mod


def coarse_to_fine(source: Cloud, target: Cloud, voxel_size: float, seed: int = 0,
                   n_scales: int = 3, iterations: int = 100,
                   retry: bool = True, fitness_gate: float = 0.40):
    """``Coarse_to_fine_FGR_M_GICP``: FGR seed -> 3-scale doubling M-GICP ->
    information matrix.  Returns (RegistrationResult, (6, 6) info matrix,
    gate_fitness).

    ``n_scales``/``iterations`` default to the reference's values
    (ALL_FUNCTIONS.py:325); tests use reduced budgets.

    ``gate_fitness`` is the full-cloud fitness at 2*voxel — the honest
    success measurement.  The doubling schedule's finest correspondence
    distance is extent-based (radius/2^(n-1), meters for TLS scenes), so
    ``res.fitness`` can score a wrong-by-meters alignment above 0.5; the
    reference gates on exactly that number (ALL_FUNCTIONS.py:369) and can
    admit false-positive edges.  Like the pipeline's retry ladder
    (pipeline._retry_pair), a gate failure re-seeds FGR at coarser voxels
    and keeps the best candidate by gate fitness.
    """
    def attempt(vmult: float, s: int):
        res_fgr = fgr_mod.registro_fgr(
            source, target, voxel_size * vmult, use_absolute_scale=True, seed=s
        )
        res = ms_mod.multiscale_gicp(
            source, target, res_fgr.transformation,
            n_scales=n_scales, iterations=iterations, schedule="doubling",
        )
        fit, _, _ = eval_mod.evaluate_registration(
            source, target, 2 * voxel_size, res.transformation
        )
        return res, float(fit)

    res, gate_fit = attempt(1.0, seed)
    if retry and gate_fit <= fitness_gate:
        # Reseed at the same voxel first: FGR's tuple sampling is the usual
        # failure mode (measured: Facade s0->s1 at 16k pts lands 2.3 m off
        # with one seed, 0.15-0.3 m with the next four), then coarsen.
        for vmult, off in ((1.0, 101), (2.0, 202), (4.0, 303)):
            cand, cand_fit = attempt(vmult, seed + off)
            if cand_fit > gate_fit:
                res, gate_fit = cand, cand_fit
            if gate_fit > fitness_gate:
                break
    info = eval_mod.information_matrix(
        source, target, voxel_size, res.transformation
    )
    return res, info, gate_fit


def full_registration(clouds: list[Cloud], voxel_size: float, k: int,
                      fitness_gate: float = 0.40, log=print,
                      n_scales: int = 3, iterations: int = 100) -> pg_mod.PoseGraph:
    """Builds the k-connectivity PoseGraph over `clouds`.

    Edge direction follows the reference: the pairwise result T registers
    cloud[source] onto cloud[target]; odometry accumulates
    odometry = T @ odometry with node pose inv(odometry)
    (ALL_FUNCTIONS.py:357-360).
    """
    n = len(clouds)
    nodes = [np.eye(4)]
    odometry = np.eye(4)
    src_l, dst_l, T_l, info_l, unc_l = [], [], [], [], []
    n_expected = k * (2 * n - k - 1) // 2
    ok = 0
    for source_id in range(n):
        for target_id in range(source_id + 1, min(source_id + k + 1, n)):
            res, info, fit = coarse_to_fine(
                clouds[source_id], clouds[target_id], voxel_size,
                seed=source_id * n + target_id,
                n_scales=n_scales, iterations=iterations,
                fitness_gate=fitness_gate,
            )
            T = np.asarray(res.transformation, np.float64)
            if target_id == source_id + 1:
                odometry = T @ odometry
                nodes.append(np.linalg.inv(odometry))
                uncertain = False
            else:
                uncertain = True
            src_l.append(source_id)
            dst_l.append(target_id)
            T_l.append(T)
            info_l.append(np.asarray(info, np.float64))
            unc_l.append(uncertain)
            ok += int(fit > fitness_gate)
            if log:
                log(
                    f"pair {source_id}->{target_id} "
                    f"{'loop' if uncertain else 'odom'} fitness={fit:.3f} "
                    f"{'ok' if fit > fitness_gate else 'FAILED'}"
                )
    if log:
        log(f"{ok}/{n_expected} successful registrations (gate {fitness_gate})")
    return pg_mod.PoseGraph(
        nodes=jnp.asarray(np.stack(nodes), jnp.float32),
        edge_src=jnp.asarray(np.asarray(src_l, np.int32)),
        edge_dst=jnp.asarray(np.asarray(dst_l, np.int32)),
        edge_T=jnp.asarray(np.stack(T_l), jnp.float32),
        edge_info=jnp.asarray(np.stack(info_l), jnp.float32),
        uncertain=jnp.asarray(np.asarray(unc_l)),
        edge_mask=jnp.ones(len(src_l), dtype=bool),
    )


def full_registration_batched(clouds: list[Cloud], voxel_size: float, k: int,
                              fitness_gate: float = 0.40, log=print,
                              n_scales: int = 3, iterations: int = 100,
                              batch_size: int = 4) -> pg_mod.PoseGraph:
    """Batched ``full_registration`` (VERDICT r3 item 6): the reference's
    O(n*k) serial pair loop (ALL_FUNCTIONS.py:349-392) becomes chunked
    vmapped FGR + doubling M-GICP + batched information matrices.

    Behavioral equivalence with the serial builder: per-cloud FGR features
    are bit-identical (computed once per cloud, same ``fgr_features``), each
    pair keeps its serial seed ``source*n + target``, and any pair whose
    first attempt fails the 2*voxel gate falls back to the SERIAL
    ``coarse_to_fine`` retry ladder — so a graph differs from the serial
    one only on pairs the serial path would also have re-attempted.
    """
    from ..parallel import pair_sharding
    from ..utils import cloud as cloud_mod

    n = len(clouds)
    pairs = [(s, t) for s in range(n)
             for t in range(s + 1, min(s + k + 1, n))]
    E = len(pairs)
    B = max(batch_size, 1)

    feats: dict[int, tuple] = {}

    def feat(i):
        if i not in feats:
            feats[i] = fgr_mod.fgr_features(clouds[i], voxel_size)
        return feats[i]

    T_all = np.zeros((E, 4, 4))
    gate_all = np.zeros(E)
    for start in range(0, E, B):
        chunk = pairs[start:start + B]
        pad = B - len(chunk)
        chunk_p = chunk + [chunk[-1]] * pad
        src_f = [feat(s) for s, _ in chunk_p]
        tgt_f = [feat(t) for _, t in chunk_p]
        src = cloud_mod.stack_clouds([c for c, _ in src_f])
        tgt = cloud_mod.stack_clouds([c for c, _ in tgt_f])
        fs = jnp.stack([f for _, f in src_f])
        ft = jnp.stack([f for _, f in tgt_f])
        opts = fgr_mod.default_options(
            src_f[0][0], tgt_f[0][0], voxel_size, use_absolute_scale=True)
        seeds = jnp.asarray([s * n + t for s, t in chunk_p], jnp.int32)
        res_fgr = fgr_mod.batched_registration_fgr(src, tgt, fs, ft, opts, seeds)
        # raw clouds for the doubling M-GICP (it preprocesses per scale)
        src_raw = cloud_mod.stack_clouds([clouds[s] for s, _ in chunk_p])
        tgt_raw = cloud_mod.stack_clouds([clouds[t] for _, t in chunk_p])
        res = pair_sharding.batched_mgicp(
            src_raw, tgt_raw, res_fgr.transformation,
            n_scales=n_scales, iterations=iterations, schedule="doubling")
        fit, _, _ = eval_mod.evaluate_registration_batch(
            src_raw, tgt_raw, 2 * voxel_size, res.transformation)
        T_np = np.asarray(res.transformation, np.float64)
        fit_np = np.asarray(fit)
        for j in range(len(chunk)):
            T_all[start + j] = T_np[j]
            gate_all[start + j] = fit_np[j]

    infos = np.zeros((E, 6, 6))
    retried = 0
    for e, (s, t) in enumerate(pairs):
        if gate_all[e] <= fitness_gate:
            # serial retry ladder — identical to the serial builder's path
            res, info, fit = coarse_to_fine(
                clouds[s], clouds[t], voxel_size, seed=s * n + t,
                n_scales=n_scales, iterations=iterations,
                fitness_gate=fitness_gate)
            T_all[e] = np.asarray(res.transformation, np.float64)
            gate_all[e] = fit
            infos[e] = np.asarray(info, np.float64)
            retried += 1
    # batched information matrices for the non-retried pairs
    todo = [e for e in range(E) if not infos[e].any()]
    for start in range(0, len(todo), B):
        idx = todo[start:start + B]
        pad_idx = idx + [idx[-1]] * (B - len(idx))
        src = cloud_mod.stack_clouds([clouds[pairs[e][0]] for e in pad_idx])
        tgt = cloud_mod.stack_clouds([clouds[pairs[e][1]] for e in pad_idx])
        T = jnp.asarray(T_all[pad_idx], jnp.float32)
        I = np.asarray(eval_mod.information_matrix_batch(
            src, tgt, voxel_size, T))
        for j, e in enumerate(idx):
            infos[e] = I[j]

    nodes = [np.eye(4)]
    odometry = np.eye(4)
    unc_l = []
    ok = 0
    for e, (s, t) in enumerate(pairs):
        if t == s + 1:
            odometry = T_all[e] @ odometry
            nodes.append(np.linalg.inv(odometry))
            unc_l.append(False)
        else:
            unc_l.append(True)
        ok += int(gate_all[e] > fitness_gate)
        if log:
            log(f"pair {s}->{t} {'loop' if unc_l[-1] else 'odom'} "
                f"fitness={gate_all[e]:.3f} "
                f"{'ok' if gate_all[e] > fitness_gate else 'FAILED'}")
    if log:
        log(f"{ok}/{E} successful registrations (gate {fitness_gate}, "
            f"{retried} retried serially)")
    return pg_mod.PoseGraph(
        nodes=jnp.asarray(np.stack(nodes), jnp.float32),
        edge_src=jnp.asarray(np.asarray([s for s, _ in pairs], np.int32)),
        edge_dst=jnp.asarray(np.asarray([t for _, t in pairs], np.int32)),
        edge_T=jnp.asarray(np.stack(T_all), jnp.float32),
        edge_info=jnp.asarray(np.stack(infos), jnp.float32),
        uncertain=jnp.asarray(np.asarray(unc_l)),
        edge_mask=jnp.ones(E, dtype=bool),
    )
