"""Per-component timing probe for the production stage-1 FGR pair path
(banded features prebuilt): match -> tuple test -> GNC -> evaluation.

Salted per BENCHMARKS.md methodology (every timed call perturbs an input so
the remote-TPU tunnel cannot serve a cached (executable, args) pair).

Usage: python benchmarks/probe_fgr_split.py
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
from pcr_tpu.ops import fpfh_sorted
from pcr_tpu.utils import cloud as cloud_mod


def timed(label, fn, *args, reps=4):
    jax.block_until_ready(fn(*args, salt=0.0))  # compile
    best = float("inf")
    for r in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args, salt=1e-6 * (r + 1)))
        best = min(best, time.time() - t0)
    print(f"{label:46s} {best * 1e3:9.1f} ms")
    return best


def main():
    v = 0.1
    c0, c1 = cloud_mod.load_dataset("NCLT", indices=[0, 1])
    c0 = cloud_mod.compact(c0, cloud_mod.bucket_capacity(c0, 2048))
    c1 = cloud_mod.compact(c1, cloud_mod.bucket_capacity(c1, 2048))
    src, fs = fpfh_sorted.fgr_features_sorted(c0, v)
    tgt, ft = fpfh_sorted.fgr_features_sorted(c1, v)
    B = max(src.capacity, tgt.capacity)
    from pcr_tpu.pipeline import _pad_feat
    src, fs = cloud_mod.pad_to(src, B), _pad_feat(fs, B)
    tgt, ft = cloud_mod.pad_to(tgt, B), _pad_feat(ft, B)
    jax.block_until_ready((src.points, fs, tgt.points, ft))
    print(f"pair capacity {B}, valid {int(src.mask.sum())}/{int(tgt.mask.sum())}")
    opts = fgr_mod.default_options(src, tgt, v)

    def f_feat(salt=0.0):
        return fpfh_sorted.fgr_features_sorted(
            c0.with_(points=c0.points + salt), v)[1]

    @jax.jit
    def f_match(salt=0.0):
        return fgr_mod.match_features(fs + salt, src.mask, ft, tgt.mask)

    ci, cj, cm = jax.block_until_ready(f_match())

    @jax.jit
    def f_tuple(salt=0.0):
        return fgr_mod.tuple_test(
            src.points + salt, tgt.points, ci, cj, cm, 1,
            tuple_scale=opts.tuple_scale, max_tuples=opts.maximum_tuple_count)

    keep = jax.block_until_ready(f_tuple())

    @functools.partial(jax.jit)
    def f_gnc(salt=0.0):
        return fgr_mod.fgr_from_correspondences(
            src.with_(points=src.points + salt), tgt, ci, cj, keep, opts)

    T = jax.block_until_ready(f_gnc())

    @jax.jit
    def f_eval(salt=0.0):
        return eval_mod.evaluate_registration(
            src.with_(points=src.points + salt), tgt,
            opts.maximum_correspondence_distance, T)

    def f_full(salt=0.0):
        return fgr_mod.registration_fgr(
            src.with_(points=src.points + salt), tgt, fs, ft, opts, seed=1
        ).transformation

    t_f = timed("banded features (per scan)", f_feat)
    t_m = timed("match_features (nn1_mutual 33-dim)", f_match)
    t_t = timed("tuple_test", f_tuple)
    t_g = timed("GNC 300 it", f_gnc)
    t_e = timed("evaluate_registration (band)", f_eval)
    t_full = timed("registration_fgr one-jit total", f_full)
    print(f"{'sum of parts (match+tuple+gnc+eval)':46s} {(t_m+t_t+t_g+t_e)*1e3:9.1f} ms")
    print(f"{'per-pair total (features/scan + full)':46s} {(t_f+t_full)*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
