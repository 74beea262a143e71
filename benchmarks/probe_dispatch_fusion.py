"""Measure whether fusing the merged-window per-pair chain (FGR -> M-GICP ->
gate eval) into ONE jitted dispatch beats the current 3-dispatch chain through
the remote-TPU tunnel.

Streams a 16-pair NCLT mini-circuit with prebuilt features + pyramids (so the
probe isolates the solve chain), pipelined with an in-flight window exactly
like pipeline.run_full, salted per BENCHMARKS.md.

Usage: python benchmarks/probe_dispatch_fusion.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pcr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp

from pcr_tpu.models import evaluate as eval_mod
from pcr_tpu.models import fgr as fgr_mod
from pcr_tpu.models import multiscale as ms_mod
from pcr_tpu.ops import fpfh_sorted
from pcr_tpu.pipeline import _pad_feat
from pcr_tpu.utils import cloud as cloud_mod

N = 17  # scans -> 16 pairs
INFLIGHT = 4


@functools.partial(jax.jit, static_argnames=("opts", "n_scales", "iterations"))
def fused_pair_step(src_p, tgt_p, fs, ft, pyr_s, pyr_t, full_s, full_t,
                    opts, eval_dist, seed, n_scales=5, iterations=100):
    res1 = fgr_mod.registration_fgr(src_p, tgt_p, fs, ft, opts, seed=seed)
    res2 = ms_mod.multiscale_gicp_pyramids(
        pyr_s, pyr_t, res1.transformation,
        n_scales=n_scales, iterations=iterations)
    gate, _, _ = eval_mod.evaluate_registration(
        full_s, full_t, eval_dist, res2.transformation)
    return res1, res2, gate


def main():
    v = 0.1
    clouds = cloud_mod.load_dataset("NCLT", indices=list(range(N)))
    clouds = [jax.tree.map(jnp.asarray, c) for c in clouds]
    caps = cloud_mod.plan_scale_caps(clouds, ms_mod.create_scales(5))
    feats, pyrs = {}, {}
    for i, c in enumerate(clouds):
        cc = cloud_mod.compact(c, cloud_mod.bucket_capacity(c, 2048))
        feats[i] = fpfh_sorted.fgr_features_sorted(cc, v)
        pyrs[i] = ms_mod.build_pyramid(c, n_scales=5, scale_capacities=caps)
    jax.block_until_ready((feats, pyrs))
    eval_dist = 2 * v

    def pair_inputs(k, salt):
        s, t = k, k + 1
        src_f, feat_src = feats[s]
        tgt_f, feat_tgt = feats[t]
        B = max(src_f.capacity, tgt_f.capacity)
        src_p = cloud_mod.pad_to(src_f, B)
        src_p = src_p.with_(points=src_p.points + salt)
        return (src_p, cloud_mod.pad_to(tgt_f, B),
                _pad_feat(feat_src, B), _pad_feat(feat_tgt, B),
                pyrs[s], pyrs[t], clouds[s], clouds[t],
                # opts from the PAIR bucket B, matching the production
                # runners' post-padding option set
                fgr_mod.default_options_capacity(B, v))

    def run(step, label, salt0):
        inflight = []
        t0 = None
        for k in range(N - 1):
            if k == 2:
                t0 = time.time()  # skip first pairs (compile + ramp)
            out = step(k, salt0 + 1e-6 * k)
            inflight.append(out)
            while len(inflight) >= INFLIGHT:
                jax.block_until_ready(inflight.pop(0))
        while inflight:
            jax.block_until_ready(inflight.pop(0))
        dt = time.time() - t0
        pairs = N - 1 - 2
        print(f"{label:38s} {dt / pairs * 1e3:8.1f} ms/pair "
              f"({pairs / dt:5.2f} pairs/s)")
        return dt / pairs

    def step_chain(k, salt):
        src_p, tgt_p, fs, ft, ps, pt, cs, ct, opts = pair_inputs(k, salt)
        r1 = fgr_mod.registration_fgr(src_p, tgt_p, fs, ft, opts, seed=k)
        r2 = ms_mod.multiscale_gicp_pyramids(ps, pt, r1.transformation,
                                             n_scales=5, iterations=100)
        g, _, _ = eval_mod.evaluate_registration(cs, ct, eval_dist,
                                                 r2.transformation)
        return r1, r2, g

    def step_fused(k, salt):
        src_p, tgt_p, fs, ft, ps, pt, cs, ct, opts = pair_inputs(k, salt)
        return fused_pair_step(src_p, tgt_p, fs, ft, ps, pt, cs, ct, opts,
                               jnp.float32(eval_dist), k)

    # interleave orders to be fair to cache warmth
    run(step_chain, "3-dispatch chain (warmup)", 0.0)
    run(step_fused, "fused 1-dispatch (warmup)", 1e-3)
    a = run(step_chain, "3-dispatch chain", 2e-3)
    b = run(step_fused, "fused 1-dispatch", 3e-3)
    a2 = run(step_chain, "3-dispatch chain (rep2)", 4e-3)
    b2 = run(step_fused, "fused 1-dispatch (rep2)", 5e-3)
    print(f"best chain {min(a, a2)*1e3:.1f} ms vs fused {min(b, b2)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
