"""Measure the host-side fetch cost of the merged-window drain: the loop
fetches ~7 small buffers per pair (two 4x4 poses + 5 scalars) as separate
np.asarray/float() calls — each a blocking tunnel round trip on the SAME
host thread that dispatches the next pairs.

Compares: (a) per-field fetches exactly as pipeline.drain_one, (b) one
jax.device_get of the whole tuple, (c) copy_to_host_async at dispatch time
then per-field fetches at drain.

Usage: python benchmarks/probe_fetch_cost.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pcr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pcr_tpu.models import evaluate as eval_mod
from pcr_tpu.models import fgr as fgr_mod
from pcr_tpu.models import multiscale as ms_mod
from pcr_tpu.ops import fpfh_sorted
from pcr_tpu.pipeline import _pad_feat
from pcr_tpu.utils import cloud as cloud_mod

N = 17
INFLIGHT = 4


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

    def dispatch(k, salt):
        s, t = k, k + 1
        src_f, feat_src = feats[s]
        tgt_f, feat_tgt = feats[t]
        B = max(src_f.capacity, tgt_f.capacity)
        src_p = cloud_mod.pad_to(src_f, B)
        src_p = src_p.with_(points=src_p.points + salt)
        tgt_p = cloud_mod.pad_to(tgt_f, B)
        opts = fgr_mod.default_options(src_f, tgt_f, v)
        r1 = fgr_mod.registration_fgr(src_p, tgt_p, _pad_feat(feat_src, B),
                                      _pad_feat(feat_tgt, B), opts, seed=k)
        r2 = ms_mod.multiscale_gicp_pyramids(pyrs[s], pyrs[t],
                                             r1.transformation,
                                             n_scales=5, iterations=100)
        g, _, _ = eval_mod.evaluate_registration(clouds[s], clouds[t],
                                                 eval_dist, r2.transformation)
        return r1, r2, g

    def run(label, drain, salt0, async_copy=False):
        inflight = []
        t0 = None
        for k in range(N - 1):
            if k == 2:
                t0 = time.time()
            out = dispatch(k, salt0 + 1e-6 * k)
            if async_copy:
                for leaf in jax.tree.leaves(out):
                    leaf.copy_to_host_async()
            inflight.append(out)
            while len(inflight) >= INFLIGHT:
                drain(inflight.pop(0))
        while inflight:
            drain(inflight.pop(0))
        dt = time.time() - t0
        pairs = N - 1 - 2
        print(f"{label:44s} {dt / pairs * 1e3:8.1f} ms/pair "
              f"({pairs / dt:5.2f} pairs/s)")

    def drain_fields(out):  # exactly what pipeline drain_one fetches
        r1, r2, g = out
        _ = np.asarray(r1.transformation, np.float64)
        _ = (float(r1.fitness), float(r1.inlier_rmse))
        _ = np.asarray(r2.transformation, np.float64)
        _ = (float(r2.fitness), float(r2.inlier_rmse), float(g))

    def drain_onerpc(out):
        _ = jax.device_get(out)

    run("per-field fetches (pipeline today)", drain_fields, 0.0)
    run("one device_get (warm)", drain_onerpc, 1e-3)
    run("per-field fetches (rep2)", drain_fields, 2e-3)
    run("one device_get (rep2)", drain_onerpc, 3e-3)
    run("copy_to_host_async + per-field", drain_fields, 4e-3, async_copy=True)
    run("copy_to_host_async + per-field (rep2)", drain_fields, 5e-3,
        async_copy=True)


if __name__ == "__main__":
    main()
