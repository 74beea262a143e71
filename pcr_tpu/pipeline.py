"""End-to-end pipeline: the three reference stages as batched, restartable
runners (SURVEY §3), plus the k-connectivity graph mode (P6).

Stage contract (SURVEY §5.4 — kept from the reference): every stage persists
poses as ``pose_{i+1}_{i}.txt`` / ``pose{i}.txt`` text files and the next
stage reloads them, so the pipeline is restartable at stage granularity and
interoperable with the reference's own fixture files.

  stage 1  FGR over all circuit pairs        (1_FGR_pairwise_registration...)
  stage 2  M-GICP refinement of stage-1 poses (2_MGICP_refinement...)
  stage 3  global refinement: LUM / SLERP / SLERP+LUM / pose-graph LM
           (3_Global_Optimizations...)

Pairs are processed in device-sized batches: clouds are padded to the dataset
bucket, stacked, and the batch is vmapped (and, when a mesh is given,
shard_mapped over the ``pairs`` axis).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .models import evaluate as eval_mod
from .models import fgr as fgr_mod
from .models import multiscale as ms_mod
from .models.global_refine import closed_form, pose_graph as pg_mod
from .ops import fpfh_sorted
from .parallel import pair_sharding
from .utils import cloud as cloud_mod
from .utils import poses_io, se3


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Defaults are the reference's constants (SURVEY §3, §5 config table)."""

    dataset: str = "Facade"
    voxel_size: float = 0.1          # 1_...py:131
    fgr_iterations: int = 300        # 1_...py:57
    fgr_seed: int = 0
    mgicp_scales: int = 5            # 2_...py:185
    mgicp_iterations: int = 100      # 2_...py:184
    fitness_gate: float = 0.40       # ALL_FUNCTIONS.py:369
    # Re-registration fallback (SURVEY §5 failure handling — the reference
    # logs failures but still uses them downstream; we retry).  A pair whose
    # refined finest-scale fitness lands at/below retry_fitness is re-seeded
    # with FGR at coarser voxels (coarse FPFH is far more robust for
    # low-overlap loop closures: NCLT pair 0<-900 fails at 0.1 but recovers
    # to 3 cm from a 0.4-voxel seed) and re-refined; candidates are compared
    # by evaluate_registration at 2*voxel on the full clouds.
    retry_failed: bool = True
    retry_fitness: float = 0.15
    retry_voxel_mults: tuple = (2.0, 4.0)
    batch_size: int = 2              # pairs per device batch
    # Streamed-loop pipelining depth: keep this many dispatched pairs in
    # flight before fetching results.  Each fetch is a host<->device round
    # trip (30-100 ms over a remote-TPU tunnel); a small window hides that
    # latency behind the next pairs' device work.  1 = fully synchronous.
    inflight: int = 4
    # "auto": plan the tightest safe static capacities from the loaded clouds
    # (cloud.plan_scale_caps); a tuple pins them; None disables compaction.
    scale_capacities: tuple | str | None = "auto"
    # Rounding unit for per-cloud capacity buckets in stage 1
    # (cloud.bucket_capacity granularity); small values let tests exercise
    # heterogeneous buckets on small synthetic clouds.
    bucket_granularity: int = 4096
    # Stage-1 feature path: "banded" = gather-free sorted-space normals+FPFH
    # (ops/fpfh_sorted, VERDICT r3 item 4); "selection" = the k=200
    # approx-selection + gather path (ops/fpfh).  Both validated against the
    # FPFH oracle and the FGR fixtures.
    stage1_features: str = "banded"
    stage1_band: int = 2048
    output_root: str = "outputs"

    def out_dir(self, stage: str) -> str:
        return os.path.join(self.output_root, stage, self.dataset)


def circuit_pairs(n: int) -> list[tuple[int, int]]:
    """(source, target) scan indices for the closed circuit: (1,0), (2,1),
    ..., (0, n-1) — the reference's loop incl. wraparound (1_...py:134-147)."""
    return [((i + 1) % n, i) for i in range(n)]


class PairMetrics:
    """Per-pair structured metrics log (SURVEY §5 observability)."""

    def __init__(self):
        self.rows = []

    def add(self, stage, src, tgt, fitness, rmse, seconds, **extra):
        self.rows.append(
            dict(stage=stage, src=int(src), tgt=int(tgt), fitness=float(fitness),
                 rmse=float(rmse), seconds=float(seconds), **extra)
        )

    def save(self, path, stage: str | None = None):
        """Write rows as jsonl; ``stage`` filters so each stage's file carries
        only its own rows (a shared metrics object in ``full`` used to mix fgr
        rows into stage2.jsonl, mis-aggregating any consumer)."""
        rows = self.rows if stage is None else [
            r for r in self.rows if r["stage"] == stage]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row) + "\n")

    def success_rate(self, gate: float, key: str = "fitness",
                     stage: str | None = None) -> float:
        """Fraction of pairs whose ``key`` exceeds ``gate``.  For stage 2 use
        key='gate_fitness' — full-cloud fitness at 2*voxel, the measurement
        the retry ladder gates on (matching the coarse-to-fine gate intent of
        ALL_FUNCTIONS.py:369) — NOT the finest-scale fitness at 0.1 m, which
        reads misleadingly low on sparse outdoor scans."""
        rows = [r for r in self.rows
                if (stage is None or r["stage"] == stage) and key in r]
        if not rows:
            return 0.0
        return sum(1 for r in rows if r[key] > gate) / len(rows)


def _load_circuit_clouds(cfg: PipelineConfig, indices=None):
    """Dataset loader for the circuit runners.  Large circuits stream:
    host-parse everything, upload scans lazily inside the compute loop
    (cloud.LazyClouds) — a monolithic up-front device transfer of 901 padded
    NCLT scans is ~380 MB and serializes ahead of all compute."""
    idx = list(indices) if indices is not None else list(
        range(poses_io.CIRCUIT_SIZES[cfg.dataset]))
    if len(idx) > 32:
        return cloud_mod.load_dataset_lazy(cfg.dataset, indices=idx)
    return cloud_mod.load_dataset(cfg.dataset, indices=idx)


def _pad_feat(feat, capacity: int):
    """Pad (N, 33) features with zero rows to ``capacity`` (mask handles it)."""
    if feat.shape[0] == capacity:
        return feat
    pad = jnp.zeros((capacity - feat.shape[0],) + feat.shape[1:], feat.dtype)
    return jnp.concatenate([feat, pad], axis=0)


def _host_prefetch(tree):
    """Start device->host copies for every array leaf of a just-dispatched
    result, without blocking.

    The drain path reads each result field separately (np.asarray of the pose,
    float() of fitness/rmse/gate) and each such read is a blocking device-get
    round trip on the SAME host thread that dispatches the next pairs.
    Through the remote-TPU tunnel those round trips dominate the merged
    window: measured 202-285 ms/pair drained field-by-field vs 81-87 ms with
    the copies started at dispatch time (benchmarks/probe_fetch_cost.py, 16
    NCLT pairs, solve chain only) — the fetch then finds the bytes already on
    the host.  Purely a transfer-scheduling hint: values are unchanged."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()


@functools.partial(
    jax.jit,
    static_argnames=("bucket", "voxel", "band", "features_kind"))
def _prep_features(c, bucket: int, voxel, band: int, features_kind: str):
    """Fused per-scan stage-1 preprocessing: compact to the scan's capacity
    bucket -> features, ONE dispatch instead of two.

    Fusion boundaries are drawn along the static-key dependencies: this
    module genuinely depends on ``bucket``, so compiling one executable per
    bucket is irreducible work.  The stage-2 pyramid/GICP modules do NOT
    depend on the bucket and stay separate dispatches — an earlier draft
    inlined them here and into the pair step, and every new bucket combo
    encountered mid-circuit recompiled the whole merged module (25-55 s
    spikes through the tunnel) for zero steady-state gain (the dispatch-
    fusion probe measured fused == chained on-device)."""
    cc = cloud_mod.compact(c, bucket)
    if features_kind == "banded":
        return fpfh_sorted.fgr_features_sorted(cc, voxel, band=band)
    return fgr_mod.fgr_features(cc, voxel)


@functools.partial(jax.jit, static_argnames=("B",))
def _pad_pair(src_f, feat_src, tgt_f, feat_tgt, B: int):
    """Pad a pair's clouds + features to the pair bucket in ONE tiny dispatch
    (4 concatenates).  Kept OUT of the FGR module on purpose: a jit's cache
    key includes its input shapes, so folding the pads into the solve would
    compile the full FGR executable once per ordered (bucket_src, bucket_tgt)
    combo encountered mid-circuit (up to 9 for 3 buckets) instead of once per
    pair bucket B (3) — each a 25-55 s cold-cache spike for a module this
    size.  This pad module also compiles per combo, but it is four concats."""
    return (cloud_mod.pad_to(src_f, B), _pad_feat(feat_src, B),
            cloud_mod.pad_to(tgt_f, B), _pad_feat(feat_tgt, B))


def _fgr_pair_step(src_f, feat_src, tgt_f, feat_tgt, seed, B: int, opts):
    """Per-pair stage-1 step: pad both scans to the pair bucket (tiny
    shape-combo-keyed dispatch) + FGR (B-keyed dispatch) — two dispatches
    instead of five, with the same compile profile as the unfused code (the
    big FGR module compiles once per B, see _pad_pair)."""
    src_p, fs, tgt_p, ft = _pad_pair(src_f, feat_src, tgt_f, feat_tgt, B)
    return fgr_mod.registration_fgr(src_p, tgt_p, fs, ft, opts, seed=seed)


def run_stage1_fgr(cfg: PipelineConfig, clouds=None, n: int | None = None,
                   metrics: PairMetrics | None = None, mesh=None) -> np.ndarray:
    """FGR over all circuit pairs; returns (n, 4, 4) relative poses and writes
    them in the reference layout.

    With cfg.batch_size > 1 (or a mesh) pairs run in vmapped chunks whose B+1
    scans are featurized once each; with ``mesh`` the chunk is shard_mapped
    over the 'pairs' axis (SURVEY §2.4 pair parallelism for the reference's
    hottest serial loop, 1_...py:134-147)."""
    n = n or poses_io.CIRCUIT_SIZES[cfg.dataset]
    clouds = clouds or _load_circuit_clouds(cfg, range(n))
    metrics = metrics if metrics is not None else PairMetrics()
    if cfg.batch_size > 1 or mesh is not None:
        return _run_stage1_fgr_batched(cfg, clouds, n, metrics, mesh)
    # Per-cloud FGR features (normals + FPFH — the reference's hottest kernel,
    # 1_...py:44-50) are computed ONCE per scan and shared between the two
    # adjacent pairs each scan serves, mirroring stage 2's pyramid cache.
    # Each scan runs at its own capacity bucket (cloud.bucket_capacity): the
    # selection/distance/gather cost scales with the query x ref AREA, and the
    # NCLT scans average 21k valid points in the 32k dataset bucket.
    feat_cache: dict[int, tuple] = {}

    def features(i):
        if i not in feat_cache:
            # Host-side bucket (no device_get on a LazyClouds) + one fused
            # compact->features dispatch — see run_full.prep for the tunnel
            # overhead this removes.
            hc = (clouds.host(i)
                  if isinstance(clouds, cloud_mod.LazyClouds) else clouds[i])
            bucket = cloud_mod.bucket_capacity(hc, cfg.bucket_granularity)
            feat_cache[i] = _prep_features(
                clouds[i], bucket, cfg.voxel_size, cfg.stage1_band,
                cfg.stage1_features)
        return feat_cache[i]

    ckpt = os.path.join(cfg.out_dir("metrics"), "stage1_partial.npy")
    out = np.zeros((n, 4, 4))
    # Pipelined loop: dispatch up to cfg.inflight pairs before fetching the
    # oldest result, so each fetch's host<->device round trip overlaps the
    # next pairs' device work (dispatched results hold their own device-buffer
    # references, so the feature cache can evict eagerly).
    inflight: list[tuple] = []
    drained = 0
    last_drain = time.time()

    def drain_one():
        nonlocal drained, last_drain
        k, src_i, tgt_i, res, t0 = inflight.pop(0)
        out[k] = np.asarray(res.transformation, np.float64)
        # wall-true per-pair time: delta between consecutive result fetches
        # (sums to stage wall time; a dispatch->fetch delta would count each
        # pair's window-mates' device time cfg.inflight times over).
        now = time.time()
        metrics.add("fgr", src_i, tgt_i, float(res.fitness),
                    float(res.inlier_rmse), now - last_drain)
        last_drain = now
        drained = k + 1
        if drained % 50 == 0:  # crash-resumable partial checkpoint
            os.makedirs(os.path.dirname(ckpt), exist_ok=True)
            np.save(ckpt, out[:drained])
            metrics.save(os.path.join(cfg.out_dir("metrics"), "stage1.jsonl"),
                         stage="fgr")

    for k, (src_i, tgt_i) in enumerate(circuit_pairs(n)):
        t0 = time.time()
        src, feat_src = features(src_i)
        tgt, feat_tgt = features(tgt_i)
        # Pair runs at the max of the two scan buckets (matching/GNC cost is
        # area- and row-bound too); _fgr_pair_step pads both sides to B (zero
        # feature rows, mask False) inside one fused dispatch.
        B = max(src.capacity, tgt.capacity)
        opts = fgr_mod.default_options_capacity(B, cfg.voxel_size)
        res = _fgr_pair_step(src, feat_src, tgt, feat_tgt,
                             cfg.fgr_seed + src_i, B, opts)
        _host_prefetch(res)
        inflight.append((k, src_i, tgt_i, res, t0))
        # keep only features still needed (next pair reuses cloud src_i)
        for key in [key for key in feat_cache if key not in (src_i, (src_i + 1) % n)]:
            del feat_cache[key]
        while len(inflight) >= max(cfg.inflight, 1):
            drain_one()
    while inflight:
        drain_one()
    poses = out
    _flag_stage1_outliers(poses, metrics)
    poses_io.save_relative_circuit(cfg.out_dir("relative_poses_FGR"), poses)
    metrics.save(os.path.join(cfg.out_dir("metrics"), "stage1.jsonl"),
                 stage="fgr")
    return poses


def _flag_stage1_outliers(poses: np.ndarray, metrics: PairMetrics,
                          window: int = 10, factor: float = 3.0,
                          slack_m: float = 0.5) -> int:
    """Mark suspect stage-1 pairs in the metrics log (VERDICT r4 weak #7).

    Cheap sanity proxy: a circuit's per-pair translation magnitudes vary
    smoothly (consecutive scans of a moving platform), so a pair whose
    ``|t|`` exceeds ``factor x`` the median of its ±window circuit neighbors
    (plus an absolute slack for near-stationary stretches) is flagged
    ``stage1_outlier`` — visible for inspection BEFORE stage 2's refinement
    hides it.  Every fgr row gains ``t_norm_m``; flagged rows gain
    ``stage1_outlier: true``.  Returns the number of flagged pairs."""
    t = np.linalg.norm(np.asarray(poses)[:, :3, 3], axis=1)
    n = len(t)
    off = [d for d in range(-window, window + 1) if d != 0]
    idx = (np.arange(n)[:, None] + np.asarray(off)[None, :]) % n
    med = np.median(t[idx], axis=1)
    flagged = t > np.maximum(factor * med, med + slack_m)
    rows = {(r["src"], r["tgt"]): r for r in metrics.rows if r["stage"] == "fgr"}
    count = 0
    for k, (s, tg) in enumerate(circuit_pairs(n)):
        r = rows.get((s, tg))
        if r is None:
            continue
        r["t_norm_m"] = float(t[k])
        if flagged[k]:
            r["stage1_outlier"] = True
            count += 1
    return count


def _run_stage1_fgr_batched(cfg: PipelineConfig, clouds, n: int,
                            metrics: PairMetrics, mesh) -> np.ndarray:
    """Pair-parallel stage 1.  A chunk of B consecutive circuit pairs touches
    exactly B+1 consecutive-mod-n scans (the wraparound pair's source is scan
    0, which follows scan n-1 in circuit order), so the chunk featurizes its
    scans once each (vmapped — or shard_mapped over 'pairs') and registers as
    ONE batched FGR call; src/tgt per-pair views are slices of the scan stack.
    Keeps the serial runner's once-per-scan FPFH economy while filling the
    chip/mesh with a batch.

    Config parity with the serial runner (VERDICT r3 weak #3): each chunk is
    compacted to the max per-cloud capacity bucket among its scans (keeping
    the bucketing win in chunks), and every pair carries its own
    ``maximum_tuple_count = 0.2 * max(bucket_src, bucket_tgt)`` — the cap is
    a traced value, so per-pair counts cost no recompilation."""
    B = max(cfg.batch_size, 1)
    if mesh is not None:
        ndev = mesh.shape["pairs"]
        B = -(-max(B, ndev) // ndev) * ndev
    opts = fgr_mod.default_options(clouds[0], clouds[0], cfg.voxel_size)
    buckets = [cloud_mod.bucket_capacity(c, cfg.bucket_granularity)
               for c in clouds]
    out = np.zeros((n, 4, 4))
    ckpt = os.path.join(cfg.out_dir("metrics"), "stage1_partial.npy")
    for start in range(0, n, B):
        t0 = time.time()
        m = min(B, n - start)  # real pairs in this chunk
        scan_ids = [(start + j) % n for j in range(m + 1)]
        cap = max(buckets[i] for i in scan_ids)  # chunk capacity bucket
        stacked = cloud_mod.stack_clouds(
            [cloud_mod.compact(clouds[i], cap) for i in scan_ids])
        # per-pair tuple cap = the serial runner's per-pair-bucket options
        # (pipeline.run_stage1_fgr: default_options on the pair padded to
        # max(bucket_src, bucket_tgt) -> 0.2 * that capacity)
        pair_caps = [
            max(buckets[scan_ids[min(j + 1, m)]], buckets[scan_ids[min(j, m - 1)]])
            for j in range(B)
        ]
        max_tuples = jnp.asarray(
            [max(int(0.2 * c), 256) for c in pair_caps], jnp.int32)
        if mesh is not None:
            ndev = mesh.shape["pairs"]
            pad_s = (-len(scan_ids)) % ndev
            if pad_s:  # feature shard_map needs a divisible scan batch
                stacked = jax.tree.map(
                    lambda x: jnp.concatenate(
                        [x, jnp.repeat(x[-1:], pad_s, axis=0)]), stacked)
            feat_clouds, feats = pair_sharding.sharded_fgr_features(
                mesh, stacked, cfg.voxel_size,
                features=cfg.stage1_features, band=cfg.stage1_band)
            # replicate the scan-feature stack (all-gather over ICI) so the
            # src/tgt per-pair gather below is unambiguous; sharded_fgr then
            # re-slices its 'pairs' shard locally.
            from .parallel import mesh as mesh_mod
            feat_clouds, feats = jax.tree.map(
                lambda x: jax.device_put(x, mesh_mod.replicated(mesh)),
                (feat_clouds, feats))
        elif cfg.stage1_features == "banded":
            feat_clouds, feats = fpfh_sorted.batched_fgr_features_sorted(
                stacked, cfg.voxel_size, band=cfg.stage1_band)
        else:
            feat_clouds, feats = fgr_mod.batched_fgr_features(
                stacked, cfg.voxel_size)
        # pair j of the chunk: src = scan slot j+1, tgt = slot j; the tail
        # chunk pads to B by repeating its last pair (dropped after fetch).
        src_pos = jnp.asarray(np.minimum(np.arange(B) + 1, m))
        tgt_pos = jnp.asarray(np.minimum(np.arange(B), m - 1))
        src = jax.tree.map(lambda x: x[src_pos], feat_clouds)
        tgt = jax.tree.map(lambda x: x[tgt_pos], feat_clouds)
        fs, ft = feats[src_pos], feats[tgt_pos]
        seeds = jnp.asarray(
            [cfg.fgr_seed + scan_ids[min(j + 1, m)] for j in range(B)],
            jnp.int32)
        if mesh is not None:
            res = pair_sharding.sharded_fgr(mesh, src, tgt, fs, ft, seeds, opts,
                                            max_tuples=max_tuples)
        else:
            res = fgr_mod.batched_registration_fgr(src, tgt, fs, ft, opts, seeds,
                                                   max_tuples=max_tuples)
        T = np.asarray(res.transformation, np.float64)
        fit, rmse = np.asarray(res.fitness), np.asarray(res.inlier_rmse)
        dt = (time.time() - t0) / m
        for j in range(m):
            out[start + j] = T[j]
            metrics.add("fgr", scan_ids[j + 1], scan_ids[j],
                        float(fit[j]), float(rmse[j]), dt)
        os.makedirs(os.path.dirname(ckpt), exist_ok=True)
        np.save(ckpt, out[: start + m])  # crash-resumable partial checkpoint
    _flag_stage1_outliers(out, metrics)
    poses_io.save_relative_circuit(cfg.out_dir("relative_poses_FGR"), out)
    metrics.save(os.path.join(cfg.out_dir("metrics"), "stage1.jsonl"),
                 stage="fgr")
    return out


def _retry_pair(cfg: PipelineConfig, src_c, tgt_c, res0, src_pyr, tgt_pyr,
                seed_base: int = 0):
    """Re-registration fallback ladder: FGR at coarser voxels -> re-refine;
    candidates compared by full-cloud fitness at 2*voxel (finest-scale
    fitness is not comparable across seeds at low overlap)."""
    eval_dist = 2 * cfg.voxel_size

    def score(T):
        fit, _, _ = eval_mod.evaluate_registration(
            src_c, tgt_c, eval_dist, jnp.asarray(T, jnp.float32))
        return float(fit)

    best_res, best_score, status = res0, score(res0.transformation), "ok"
    for m in cfg.retry_voxel_mults:
        res_fgr = fgr_mod.registro_fgr(
            src_c, tgt_c, m * cfg.voxel_size, seed=cfg.fgr_seed + seed_base + 1,
        )
        cand = ms_mod.multiscale_gicp_pyramids(
            src_pyr, tgt_pyr, jnp.asarray(res_fgr.transformation, jnp.float32),
            n_scales=cfg.mgicp_scales, iterations=cfg.mgicp_iterations,
        )
        sc = score(cand.transformation)
        if sc > best_score:
            best_res, best_score, status = cand, sc, f"retried_voxel_x{m:g}"
    if float(best_res.fitness) <= cfg.retry_fitness:
        status += ",low_fitness"
    return best_res, status, best_score



def _annotate_gate_fitness(cfg: PipelineConfig, clouds, pairs, poses,
                           metrics: PairMetrics) -> np.ndarray:
    """Full-cloud fitness at 2*voxel for every refined pair — the measurement
    the retry ladder gates on and the success-rate the summary should report
    (the reference's 0.40 gate applies to coarse-to-fine fitness,
    ALL_FUNCTIONS.py:369 — NOT finest-scale fitness at 0.1 m).  Batched
    band-NN evaluation; each pair's metrics row gains a ``gate_fitness``."""
    eval_dist = 2 * cfg.voxel_size
    n = len(pairs)
    B = max(cfg.batch_size, 4)
    gate = np.zeros(n)
    for start in range(0, n, B):
        idx = list(range(start, min(start + B, n)))
        pad_idx = idx + [idx[-1]] * (B - len(idx))
        src = cloud_mod.stack_clouds([clouds[pairs[k][0]] for k in pad_idx])
        tgt = cloud_mod.stack_clouds([clouds[pairs[k][1]] for k in pad_idx])
        T = jnp.asarray(np.asarray(poses)[pad_idx], jnp.float32)
        fit, _, _ = eval_mod.evaluate_registration_batch(src, tgt, eval_dist, T)
        gate[idx] = np.asarray(fit)[: len(idx)]
    row_for = {}
    for i, r in enumerate(metrics.rows):
        if r["stage"] == "mgicp":
            row_for[(r["src"], r["tgt"])] = i
    for k, (s, t) in enumerate(pairs):
        if (s, t) in row_for:
            metrics.rows[row_for[(s, t)]]["gate_fitness"] = float(gate[k])
    return gate


def run_stage2_mgicp(cfg: PipelineConfig, init_poses: np.ndarray | None = None,
                     clouds=None, n: int | None = None, mesh=None,
                     metrics: PairMetrics | None = None) -> np.ndarray:
    """M-GICP refinement of the stage-1 poses over all circuit pairs.

    Pairs run in batches of cfg.batch_size via vmap; with ``mesh`` given the
    batch is shard_mapped over the 'pairs' axis.
    """
    n = n or poses_io.CIRCUIT_SIZES[cfg.dataset]
    clouds = clouds or _load_circuit_clouds(cfg, range(n))
    if init_poses is None:
        init_poses = poses_io.load_relative_circuit(cfg.out_dir("relative_poses_FGR"), n)
    metrics = metrics if metrics is not None else PairMetrics()
    pairs = circuit_pairs(n)
    B = cfg.batch_size
    if mesh is not None:  # pair batch must fill the 'pairs' mesh axis
        ndev = mesh.shape["pairs"]
        B = -(-max(B, ndev) // ndev) * ndev
    caps = cfg.scale_capacities
    if caps == "auto":
        caps = cloud_mod.plan_scale_caps(clouds, ms_mod.create_scales(cfg.mgicp_scales))
    out = np.zeros((n, 4, 4))

    if B == 1 and mesh is None:
        # Streamed path: one pair saturates a chip (measured), and each cloud
        # serves two adjacent pairs — cache per-cloud pyramids so
        # preprocessing runs once per cloud instead of twice.
        pyr_cache: dict[int, tuple] = {}

        def pyramid(i):
            if i not in pyr_cache:
                pyr_cache[i] = ms_mod.build_pyramid(
                    clouds[i], n_scales=cfg.mgicp_scales,
                    scale_capacities=caps,
                )
            return pyr_cache[i]

        ckpt = os.path.join(cfg.out_dir("metrics"), "stage2_partial.npy")
        # Pipelined loop (see run_stage1_fgr): dispatch cfg.inflight pairs
        # ahead of the oldest fetch; pairs whose fitness lands at/below the
        # retry gate are collected and re-registered in a second pass so the
        # main loop never stalls on a retry ladder.
        inflight: list[tuple] = []
        retries: list[tuple] = []
        row_of: dict[int, int] = {}
        drained = 0
        last_drain = time.time()

        def drain_one():
            nonlocal drained, last_drain
            k, s, t, res, t0 = inflight.pop(0)
            fit = float(res.fitness)
            out[k] = np.asarray(res.transformation, np.float64)
            row_of[k] = len(metrics.rows)
            now = time.time()  # wall-true delta (see run_stage1_fgr note)
            metrics.add("mgicp", s, t, fit, float(res.inlier_rmse),
                        now - last_drain, status="ok")
            last_drain = now
            if cfg.retry_failed and fit <= cfg.retry_fitness:
                retries.append((k, s, t, res))
            drained = k + 1
            if drained % 50 == 0:  # crash-resumable partial checkpoint
                os.makedirs(os.path.dirname(ckpt), exist_ok=True)
                np.save(ckpt, out[:drained])
                metrics.save(os.path.join(cfg.out_dir("metrics"), "stage2.jsonl"),
                             stage="mgicp")

        for k, (s, t) in enumerate(pairs):
            t0 = time.time()
            res = ms_mod.multiscale_gicp_pyramids(
                pyramid(s), pyramid(t),
                jnp.asarray(init_poses[k], jnp.float32),
                n_scales=cfg.mgicp_scales, iterations=cfg.mgicp_iterations,
            )
            _host_prefetch(res)
            inflight.append((k, s, t, res, t0))
            # keep only pyramids still needed by upcoming dispatches
            for key in [key for key in pyr_cache if key not in (s, (s + 1) % n)]:
                del pyr_cache[key]
            while len(inflight) >= max(cfg.inflight, 1):
                drain_one()
        while inflight:
            drain_one()
        for k, s, t, res0 in retries:  # second pass: retry ladder per failure
            t0 = time.time()
            res, status, _ = _retry_pair(cfg, clouds[s], clouds[t], res0,
                                         pyramid(s), pyramid(t), seed_base=s)
            out[k] = np.asarray(res.transformation, np.float64)
            metrics.rows[row_of[k]] = dict(
                stage="mgicp", src=int(s), tgt=int(t),
                fitness=float(res.fitness), rmse=float(res.inlier_rmse),
                seconds=metrics.rows[row_of[k]]["seconds"] + (time.time() - t0),
                status=status)
            for key in [key for key in pyr_cache if key not in (s, (s + 1) % n)]:
                del pyr_cache[key]
        _annotate_gate_fitness(cfg, clouds, pairs, out, metrics)
        poses_io.save_relative_circuit(cfg.out_dir("relative_poses_FGR_GICP"), out)
        abs_poses = se3.relative_to_absolute(out)
        poses_io.save_absolute_poses(
            cfg.out_dir("absolute_poses_FGR_GICP"), np.asarray(abs_poses)
        )
        metrics.save(os.path.join(cfg.out_dir("metrics"), "stage2.jsonl"),
                 stage="mgicp")
        return out

    retries: list[tuple] = []
    row_of: dict[int, int] = {}
    for start in range(0, n, B):
        chunk = pairs[start : start + B]
        # pad the tail chunk by repeating the last pair
        pad = B - len(chunk)
        chunk = chunk + [chunk[-1]] * pad
        t0 = time.time()
        src = cloud_mod.stack_clouds([clouds[s] for s, _ in chunk])
        tgt = cloud_mod.stack_clouds([clouds[t] for _, t in chunk])
        T0 = jnp.asarray(
            np.stack([init_poses[(start + k) % n] for k in range(len(chunk))]),
            jnp.float32,
        )
        kw = dict(
            n_scales=cfg.mgicp_scales, iterations=cfg.mgicp_iterations,
            scale_capacities=caps,
        )
        if mesh is not None and "points" in mesh.axis_names:
            # combined pairs x points mesh (CLI --devices P --shard-points Q):
            # every pair's source rows split over 'points' during the solve
            from .parallel import point_sharding

            res = point_sharding.sharded_mgicp_2d(mesh, src, tgt, T0, **kw)
        elif mesh is not None:
            res = pair_sharding.sharded_mgicp(mesh, src, tgt, T0, **kw)
        else:
            res = pair_sharding.batched_mgicp(src, tgt, T0, **kw)
        T_batch = np.asarray(res.transformation, np.float64)
        fit = np.asarray(res.fitness)
        rmse = np.asarray(res.inlier_rmse)
        dt = (time.time() - t0) / max(len(chunk) - pad, 1)
        for k, (s, t) in enumerate(chunk[: len(chunk) - pad]):
            out[start + k] = T_batch[k]
            row_of[start + k] = len(metrics.rows)
            metrics.add("mgicp", s, t, fit[k], rmse[k], dt, status="ok")
            if cfg.retry_failed and float(fit[k]) <= cfg.retry_fitness:
                # host-side slice (a mesh-sharded result can't be scalar-indexed)
                res_k = jax.tree.map(lambda x, kk=k: np.asarray(x)[kk], res)
                retries.append((start + k, s, t, res_k))
    # Retry ladder — identical to the streamed branch (VERDICT r3 weak #2:
    # the mesh/batched path used to silently drop the rescue that fixed the
    # NCLT wraparound pair, making --devices runs worse than single-chip).
    # Host-side and per-failure, so it costs nothing when nothing failed.
    for k, s, t, res0 in retries:
        t0 = time.time()
        src_pyr = ms_mod.build_pyramid(
            clouds[s], n_scales=cfg.mgicp_scales, scale_capacities=caps)
        tgt_pyr = ms_mod.build_pyramid(
            clouds[t], n_scales=cfg.mgicp_scales, scale_capacities=caps)
        res, status, _ = _retry_pair(cfg, clouds[s], clouds[t], res0,
                                     src_pyr, tgt_pyr, seed_base=s)
        out[k] = np.asarray(res.transformation, np.float64)
        metrics.rows[row_of[k]] = dict(
            stage="mgicp", src=int(s), tgt=int(t),
            fitness=float(res.fitness), rmse=float(res.inlier_rmse),
            seconds=metrics.rows[row_of[k]]["seconds"] + (time.time() - t0),
            status=status)
    _annotate_gate_fitness(cfg, clouds, pairs, out, metrics)
    poses_io.save_relative_circuit(cfg.out_dir("relative_poses_FGR_GICP"), out)
    abs_poses = se3.relative_to_absolute(out)
    poses_io.save_absolute_poses(cfg.out_dir("absolute_poses_FGR_GICP"), np.asarray(abs_poses))
    metrics.save(os.path.join(cfg.out_dir("metrics"), "stage2.jsonl"),
                 stage="mgicp")
    return out


def run_pair(cfg: PipelineConfig, src_i: int, tgt_i: int,
             init: np.ndarray | str = "fgr",
             metrics: PairMetrics | None = None, point_mesh=None) -> dict:
    """Register ONE scan pair end-to-end: [FGR ->] M-GICP -> info matrix.

    The single-pair workflow for datasets whose circuit is incomplete on disk
    (Courtyard ships 2 of 8 scans — SURVEY §0).  ``init``: 'fgr' runs stage-1
    FGR first; 'fixture' derives the seed from the shipped absolute
    FGR_GICP fixtures (inv(A_tgt) @ A_src); or a 4x4 array.
    ``point_mesh``: a 'points' mesh — the refinement runs with source rows
    sharded across its devices (parallel.point_sharding, SURVEY §2.4
    within-pair sharding for TLS-scale clouds).
    Returns {"T", "fitness", "rmse", "info", "seconds", ...}.
    """
    metrics = metrics if metrics is not None else PairMetrics()
    clouds = cloud_mod.load_dataset(cfg.dataset, indices=[src_i, tgt_i])
    src_c, tgt_c = clouds[0], clouds[1]
    out: dict = {"src": src_i, "tgt": tgt_i, "dataset": cfg.dataset}
    t0 = time.time()
    if isinstance(init, str) and init == "fgr":
        # Featurize each scan at its own capacity bucket, then pad the pair to
        # the max bucket — cuts the 245k-capacity Courtyard FPFH/selection to
        # the actual cloud sizes (s4 is 96k valid in the 245k bucket).
        # Feature path follows cfg.stage1_features like the circuit runners
        # (the banded default covers the TLS-scale buckets too).
        bs = cloud_mod.compact(src_c, cloud_mod.bucket_capacity(src_c))
        bt = cloud_mod.compact(tgt_c, cloud_mod.bucket_capacity(tgt_c))
        if cfg.stage1_features == "banded":
            bs_f, feat_s = fpfh_sorted.fgr_features_sorted(
                bs, cfg.voxel_size, band=cfg.stage1_band)
            bt_f, feat_t = fpfh_sorted.fgr_features_sorted(
                bt, cfg.voxel_size, band=cfg.stage1_band)
        else:
            bs_f, feat_s = fgr_mod.fgr_features(bs, cfg.voxel_size)
            bt_f, feat_t = fgr_mod.fgr_features(bt, cfg.voxel_size)
        B = max(bs_f.capacity, bt_f.capacity)
        bs_f, feat_s = cloud_mod.pad_to(bs_f, B), _pad_feat(feat_s, B)
        bt_f, feat_t = cloud_mod.pad_to(bt_f, B), _pad_feat(feat_t, B)
        res_fgr = fgr_mod.registration_fgr(
            bs_f, bt_f, feat_s, feat_t,
            fgr_mod.default_options(bs_f, bt_f, cfg.voxel_size),
            seed=cfg.fgr_seed + src_i)
        T0 = np.asarray(res_fgr.transformation, np.float64)
        out["fgr_fitness"] = float(res_fgr.fitness)
        metrics.add("fgr", src_i, tgt_i, float(res_fgr.fitness),
                    float(res_fgr.inlier_rmse), time.time() - t0)
    elif isinstance(init, str) and init == "fixture":
        A = poses_io.load_reference_absolute(cfg.dataset)
        T0 = np.linalg.inv(A[tgt_i]) @ A[src_i]
    else:
        T0 = np.asarray(init, np.float64)
    caps = cfg.scale_capacities
    if caps == "auto":
        caps = cloud_mod.plan_scale_caps(clouds, ms_mod.create_scales(cfg.mgicp_scales))
    t1 = time.time()
    if point_mesh is not None:
        from .parallel import point_sharding

        pyr_s = ms_mod.build_pyramid(src_c, n_scales=cfg.mgicp_scales,
                                     scale_capacities=caps)
        pyr_t = ms_mod.build_pyramid(tgt_c, n_scales=cfg.mgicp_scales,
                                     scale_capacities=caps)
        res = point_sharding.point_sharded_multiscale_gicp(
            point_mesh, pyr_s, pyr_t, jnp.asarray(T0, jnp.float32),
            n_scales=cfg.mgicp_scales, iterations=cfg.mgicp_iterations,
        )
        out["point_mesh"] = int(point_mesh.shape["points"])
    else:
        res = ms_mod.multiscale_gicp(
            src_c, tgt_c, jnp.asarray(T0, jnp.float32),
            n_scales=cfg.mgicp_scales, iterations=cfg.mgicp_iterations,
            scale_capacities=caps,
        )
    T = np.asarray(res.transformation, np.float64)
    out.update(
        T=T.tolist(), fitness=float(res.fitness), rmse=float(res.inlier_rmse),
        mgicp_seconds=round(time.time() - t1, 3),
        seconds=round(time.time() - t0, 3),
    )
    metrics.add("mgicp", src_i, tgt_i, float(res.fitness),
                float(res.inlier_rmse), time.time() - t1)
    info = eval_mod.information_matrix(
        tgt_c, src_c, cfg.voxel_size,
        np.asarray(se3.invert(T), np.float32),
    )
    out["info_trace"] = float(jnp.trace(info))
    d = cfg.out_dir("relative_poses_FGR_GICP")
    poses_io.save_pose(os.path.join(d, f"pose_{src_i}_{tgt_i}.txt"), T)
    metrics.save(os.path.join(cfg.out_dir("metrics"), f"pair_{src_i}_{tgt_i}.jsonl"))
    return out


def run_full(cfg: PipelineConfig, clouds=None, n: int | None = None,
             metrics: PairMetrics | None = None,
             methods=("LUM", "SLERP", "SLERP_LUM", "pose_graph")) -> dict:
    """Stages 1→3 with stage 2 STREAMED BEHIND stage 1 in one dispatch window
    (VERDICT r4 item 2).

    The reference's stage boundary is pose files (1_...py:176 → 2_...py:173)
    — that contract buys restartability, not sequentiality: pair k's M-GICP
    depends only on pair k's FGR pose, which can stay ON DEVICE.  Per pair the
    loop dispatches FGR (per-scan banded features, cached), then M-GICP seeded
    directly from the device-resident FGR transformation (no host round
    trip), then the full-cloud gate evaluation at 2*voxel — so stage-2 device
    work fills the gaps behind stage-1 dispatches, each scan uploads ONCE for
    both stages (the sequential runners stream the dataset twice), and the
    per-pair gate fitness rides the same window instead of the separate
    post-hoc `_annotate_gate_fitness` sweep.  Stage checkpoints are unchanged:
    stage-1 and stage-2 pose text files, crash-resumable partials every 50
    pairs, and per-stage metrics jsonl all land exactly as the staged runners
    write them.
    """
    n = n or poses_io.CIRCUIT_SIZES[cfg.dataset]
    clouds = clouds or _load_circuit_clouds(cfg, range(n))
    metrics = metrics if metrics is not None else PairMetrics()
    pairs = circuit_pairs(n)
    caps = cfg.scale_capacities
    if caps == "auto":
        caps = cloud_mod.plan_scale_caps(clouds, ms_mod.create_scales(cfg.mgicp_scales))
    eval_dist = 2 * cfg.voxel_size

    feat_cache: dict[int, tuple] = {}
    pyr_cache: dict[int, tuple] = {}

    def scan_bucket(i):
        # Host-side bucket: on a LazyClouds the host mask is numpy, so this
        # never pays the per-scan device_get round trip bucket_capacity takes
        # on a device cloud.
        c = clouds.host(i) if isinstance(clouds, cloud_mod.LazyClouds) else clouds[i]
        return cloud_mod.bucket_capacity(c, cfg.bucket_granularity)

    def prep(i):
        # Two dispatches per scan: fused compact->features (bucket-keyed) and
        # the 5-scale pyramid (bucket-independent shared executable).  The
        # host-side scan_bucket avoids bucket_capacity's per-scan device_get
        # round trip — that blocking fetch on the dispatcher thread was the
        # single largest non-device cost of the merged window.
        if i not in feat_cache:
            feat_cache[i] = _prep_features(
                clouds[i], scan_bucket(i), cfg.voxel_size, cfg.stage1_band,
                cfg.stage1_features)
            pyr_cache[i] = ms_mod.build_pyramid(
                clouds[i], n_scales=cfg.mgicp_scales, scale_capacities=caps)
        return feat_cache[i], pyr_cache[i]

    out1 = np.zeros((n, 4, 4))
    out2 = np.zeros((n, 4, 4))
    ckpt1 = os.path.join(cfg.out_dir("metrics"), "stage1_partial.npy")
    ckpt2 = os.path.join(cfg.out_dir("metrics"), "stage2_partial.npy")
    inflight: list[tuple] = []
    retries: list[tuple] = []
    row_of: dict[int, int] = {}
    drained = 0
    last_drain = time.time()

    def drain_one():
        nonlocal drained, last_drain
        k, s, t, res1, res2, gate = inflight.pop(0)
        out1[k] = np.asarray(res1.transformation, np.float64)
        now = time.time()  # wall-true deltas (see run_stage1_fgr note); the
        metrics.add("fgr", s, t, float(res1.fitness),      # fgr/mgicp split is
                    float(res1.inlier_rmse), now - last_drain)  # fetch-ordered
        last_drain = now
        out2[k] = np.asarray(res2.transformation, np.float64)
        fit = float(res2.fitness)
        row_of[k] = len(metrics.rows)
        now = time.time()
        metrics.add("mgicp", s, t, fit, float(res2.inlier_rmse),
                    now - last_drain, status="ok", gate_fitness=float(gate))
        last_drain = now
        if cfg.retry_failed and fit <= cfg.retry_fitness:
            retries.append((k, s, t, res2))
        drained = k + 1
        if drained % 50 == 0:  # crash-resumable partial checkpoints
            os.makedirs(os.path.dirname(ckpt1), exist_ok=True)
            np.save(ckpt1, out1[:drained])
            np.save(ckpt2, out2[:drained])
            metrics.save(os.path.join(cfg.out_dir("metrics"), "stage1.jsonl"),
                         stage="fgr")
            metrics.save(os.path.join(cfg.out_dir("metrics"), "stage2.jsonl"),
                         stage="mgicp")

    for k, (s, t) in enumerate(pairs):
        if isinstance(clouds, cloud_mod.LazyClouds):
            # prefetch the next TWO pairs' new scans: device_put is async, so
            # each host->device transfer gets up to two pair-iterations of
            # head start instead of sitting on this loop's critical path (the
            # tunnel's bandwidth swings make uploads the main straggler; the
            # LRU keeps 8 scans, so a 2-deep prefetch never evicts a live one)
            clouds[(s + 1) % n]
            clouds[(s + 2) % n]
        (src_f, feat_src), pyr_s = prep(s)
        (tgt_f, feat_tgt), pyr_t = prep(t)
        B = max(src_f.capacity, tgt_f.capacity)
        # opts from the PAIR bucket B (both scans are padded to B below),
        # matching run_stage1_fgr's post-padding options.
        opts = fgr_mod.default_options_capacity(B, cfg.voxel_size)
        src_p, fs, tgt_p, ft = _pad_pair(src_f, feat_src, tgt_f, feat_tgt, B)
        res1 = fgr_mod.registration_fgr(src_p, tgt_p, fs, ft, opts,
                                        seed=cfg.fgr_seed + s)
        res2 = ms_mod.multiscale_gicp_pyramids(
            pyr_s, pyr_t, res1.transformation,
            n_scales=cfg.mgicp_scales, iterations=cfg.mgicp_iterations)
        # Gate on the padded feature clouds (B-keyed module, like the FGR
        # solve): same valid points as the full dataset-bucket clouds
        # (compact() drops only masked rows) at ~2/3 the row capacity, and
        # the banded NN's slab covers a larger fraction of the smaller cloud
        # — so the gate is at least as accurate; any difference is
        # band-approximation-level, far below the retry gate's 0.15
        # threshold resolution.
        gate, _, _ = eval_mod.evaluate_registration(
            src_p, tgt_p, eval_dist, res2.transformation)
        _host_prefetch((res1, res2, gate))
        inflight.append((k, s, t, res1, res2, gate))
        keep = (s, (s + 1) % n)
        for cache in (feat_cache, pyr_cache):
            for key in [key for key in cache if key not in keep]:
                del cache[key]
        while len(inflight) >= max(cfg.inflight, 1):
            drain_one()
    while inflight:
        drain_one()

    def pyramid(i):  # retry-pass accessor (rebuilds after window eviction)
        if i not in pyr_cache:
            pyr_cache[i] = ms_mod.build_pyramid(
                clouds[i], n_scales=cfg.mgicp_scales, scale_capacities=caps)
        return pyr_cache[i]

    for k, s, t, res0 in retries:  # second pass: retry ladder per failure
        t0 = time.time()
        res, status, gate_sc = _retry_pair(cfg, clouds[s], clouds[t], res0,
                                           pyramid(s), pyramid(t), seed_base=s)
        out2[k] = np.asarray(res.transformation, np.float64)
        metrics.rows[row_of[k]] = dict(
            stage="mgicp", src=int(s), tgt=int(t),
            fitness=float(res.fitness), rmse=float(res.inlier_rmse),
            seconds=metrics.rows[row_of[k]]["seconds"] + (time.time() - t0),
            status=status, gate_fitness=float(gate_sc))
        keep = (s, (s + 1) % n)
        for key in [key for key in pyr_cache if key not in keep]:
            del pyr_cache[key]

    _flag_stage1_outliers(out1, metrics)
    poses_io.save_relative_circuit(cfg.out_dir("relative_poses_FGR"), out1)
    metrics.save(os.path.join(cfg.out_dir("metrics"), "stage1.jsonl"),
                 stage="fgr")
    poses_io.save_relative_circuit(cfg.out_dir("relative_poses_FGR_GICP"), out2)
    abs_poses = se3.relative_to_absolute(out2)
    poses_io.save_absolute_poses(
        cfg.out_dir("absolute_poses_FGR_GICP"), np.asarray(abs_poses))
    metrics.save(os.path.join(cfg.out_dir("metrics"), "stage2.jsonl"),
                 stage="mgicp")
    stage3 = run_stage3_global(cfg, relative_poses=out2, clouds=clouds, n=n,
                               methods=methods)
    return {"stage1": out1, "stage2": out2, "stage3": stage3}


def run_stage3_global(cfg: PipelineConfig, relative_poses: np.ndarray | None = None,
                      clouds=None, n: int | None = None,
                      methods=("LUM", "SLERP", "SLERP_LUM", "pose_graph")) -> dict:
    """Global refinement shoot-out (3_...py): all four methods on the same
    relative poses.  Returns {method: (n, 4, 4) absolute poses}."""
    n = n or poses_io.CIRCUIT_SIZES[cfg.dataset]
    if relative_poses is None:
        relative_poses = poses_io.load_relative_circuit(
            cfg.out_dir("relative_poses_FGR_GICP"), n
        )
    results = {}
    if "LUM" in methods:
        results["LUM"] = np.asarray(closed_form.refine_lum(relative_poses))
    if "SLERP" in methods:
        results["SLERP"] = np.asarray(closed_form.refine_slerp(relative_poses))
    if "SLERP_LUM" in methods:
        results["SLERP_LUM"] = np.asarray(closed_form.refine_slerp_lum(relative_poses))
    if "pose_graph" in methods:
        clouds = clouds or _load_circuit_clouds(cfg, range(n))
        # The optimizer is standard-SE(3) (Open3D semantics), so its nodes
        # are initialized from the STANDARD chain of the measured relatives —
        # the zero-odometry-residual init.  The reference feeds Open3D its
        # own reversed-order-chain absolutes (3_...py:297-313), which start
        # every odometry edge ~0.03 rad off on NCLT purely from the
        # convention gap; Open3D converges to the standard optimum either
        # way, so this is an init choice, not an algorithm change (PARITY
        # deviations).
        abs_poses = np.asarray(se3.relative_to_absolute_standard(relative_poses))
        # Info matrix at the *inverted* edge pose, as stage 3 does
        # (3_...py:315-320): clouds[i] -> clouds[i+1] with T_{i->i+1}.
        # Batched: vmapped band-NN info matrices over pair chunks.
        pairs = circuit_pairs(n)
        T_edges = np.asarray(se3.invert(np.asarray(relative_poses))).astype(np.float32)
        infos = np.zeros((n, 6, 6), np.float32)
        B = max(cfg.batch_size, 4)
        # Pipelined like the merged window: dispatch chunk c+1 (its scan
        # uploads ride the async device_put queue) before fetching chunk c's
        # 6x6 blocks, so the per-chunk fetch round trip and the next chunk's
        # uploads overlap this chunk's band-NN sweeps.
        pending: list[tuple] = []
        starts = list(range(0, n, B))
        for start in starts:
            chunk = list(range(start, min(start + B, n)))
            idx = chunk + [chunk[-1]] * (B - len(chunk))
            src = cloud_mod.stack_clouds([clouds[pairs[k][1]] for k in idx])
            tgt = cloud_mod.stack_clouds([clouds[pairs[k][0]] for k in idx])
            I = eval_mod.information_matrix_batch(
                src, tgt, cfg.voxel_size, jnp.asarray(T_edges[idx]))
            _host_prefetch(I)
            pending.append((chunk, I))
            while len(pending) >= 2:
                c0, I0 = pending.pop(0)
                infos[c0] = np.asarray(I0)[: len(c0)]
        for c0, I0 in pending:
            infos[c0] = np.asarray(I0)[: len(c0)]
        graph = pg_mod.build_circuit_graph(abs_poses, relative_poses, infos)
        out, pg_info = pg_mod.global_optimization(
            graph, max_correspondence_distance=2 * cfg.voxel_size,
            edge_prune_threshold=0.25, return_info=True,
        )
        results["pose_graph"] = np.asarray(out.nodes, np.float64)
        pruned_edges = int((~np.asarray(out.edge_mask)).sum())
    for name, poses in results.items():
        poses_io.save_absolute_poses(cfg.out_dir(f"absolute_poses_{name}"), poses)
    # Quantify every method against the measured edges (VERDICT r2 item 3:
    # stage 3 must SHOW improvement, not just run) — written beside the poses.
    # Each trajectory is scored in its NATIVE convention (see
    # circuit_edge_consistency): the closed forms and the reference chain in
    # the reference recovery; the pose graph (and the standard chain
    # baseline) in standard SE(3).
    diag = {
        "raw_chain": _consistency_summary(
            np.asarray(se3.relative_to_absolute(relative_poses)),
            relative_poses),
        "raw_chain_standard": _consistency_summary(
            np.asarray(se3.relative_to_absolute_standard(relative_poses)),
            relative_poses, convention="standard"),
    }
    for name, poses in results.items():
        conv = "standard" if name == "pose_graph" else "reference"
        diag[name] = _consistency_summary(poses, relative_poses, convention=conv)
        diag[name]["convention"] = conv
    if "pose_graph" in results:
        diag["pose_graph"]["pruned_edges"] = pruned_edges
        # Convergence diagnostics (VERDICT r3 weak #1: show WHY the LM
        # stopped — iterations, final cost, line-process state at the prune).
        diag["pose_graph"]["optimizer"] = pg_info
    p = os.path.join(cfg.out_dir("metrics"), "stage3_consistency.json")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as fh:
        json.dump(diag, fh, indent=2)
    return results


def _consistency_summary(absolute_poses, relative_poses,
                         convention: str = "reference") -> dict:
    c = eval_mod.circuit_edge_consistency(
        absolute_poses, relative_poses, convention=convention)
    return {k: v for k, v in c.items() if isinstance(v, float)}


def evaluate_circuit(clouds, relative_poses, max_dist, batch: int = 4):
    """Per-pair fitness/RMSE sweep of a circuit's relative poses — the
    reference's ``calculate_RMSE_and_fitness`` (ALL_FUNCTIONS.py:801-824):
    evaluate_registration(clouds[i+1] -> clouds[i], max_dist, rel[i]) for
    every pair incl. the wraparound closure pair.  ``relative_poses`` may come
    from a refined trajectory via ``se3.absolute_to_relative_circuit`` to rank
    stage-3 methods, as 3_...py:368-400 does against groundtruth.
    Returns (fitness (n,), rmse (n,)) numpy arrays; batched band-NN."""
    n = len(relative_poses)
    pairs = circuit_pairs(n)
    fit = np.zeros(n)
    rmse = np.zeros(n)
    for start in range(0, n, batch):
        idx = list(range(start, min(start + batch, n)))
        pad_idx = idx + [idx[-1]] * (batch - len(idx))
        src = cloud_mod.stack_clouds([clouds[pairs[k][0]] for k in pad_idx])
        tgt = cloud_mod.stack_clouds([clouds[pairs[k][1]] for k in pad_idx])
        T = jnp.asarray(np.asarray(relative_poses)[pad_idx], jnp.float32)
        f, r, _ = eval_mod.evaluate_registration_batch(src, tgt, max_dist, T)
        fit[idx] = np.asarray(f)[: len(idx)]
        rmse[idx] = np.asarray(r)[: len(idx)]
    return fit, rmse


def evaluate_against(poses: np.ndarray, reference: np.ndarray):
    """ATE arrays (rotation, translation) via the reference's metric."""
    dR, dt = se3.pose_errors(np.asarray(poses), np.asarray(reference))
    return np.asarray(dR), np.asarray(dt)
