"""Per-component timing probe for stage-1 FGR feature extraction on TPU.

Salted per the BENCHMARKS.md methodology: every timed call perturbs its input
so the remote-TPU tunnel cannot serve a cached (executable, args) pair.

Usage: python benchmarks/probe_stage1_split.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pcr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pcr_tpu.models import fgr as fgr_mod
from pcr_tpu.ops import fpfh as fpfh_ops
from pcr_tpu.ops import knn as knn_ops
from pcr_tpu.ops import normals as normals_ops
from pcr_tpu.utils import cloud


def timed(label, fn, *args, reps=3):
    fn(*args)  # compile
    best = float("inf")
    for r in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args, salt=1e-6 * (r + 1)))
        best = min(best, time.time() - t0)
    print(f"{label:42s} {best * 1e3:9.1f} ms")
    return best


def main():
    c = cloud.load_dataset("NCLT", indices=[0])[0]
    c = jax.tree.map(jnp.asarray, c)
    jax.block_until_ready(c.points)
    v = 0.1

    def f_normals(c=c, salt=0.0):
        return normals_ops.with_normals_hybrid(c.with_(points=c.points + salt), 2 * v, 20).normals

    def f_knn200(c=c, salt=0.0):
        d2, idx = knn_ops.knn(c.points + salt, c.points + salt, c.mask, 200,
                              exclude_self=True, rescore=False)
        return d2

    def f_fpfh(c=c, salt=0.0):
        cn = normals_ops.with_normals_hybrid(c.with_(points=c.points + salt), 2 * v, 20)
        return fpfh_ops.fpfh(cn.points, cn.normals, cn.mask, 10 * v, 200)

    def f_features(c=c, salt=0.0):
        return fgr_mod.fgr_features(c.with_(points=c.points + salt), v)[1]

    print(f"cloud capacity {c.capacity}, valid {int(jax.device_get(c.mask.sum()))}")
    t_n = timed("normals hybrid(0.2, 20)", f_normals)
    t_k = timed("kNN k=200 selection (rescore=False)", f_knn200)
    t_f = timed("FPFH total (normals + knn + 2 passes)", f_fpfh)
    t_all = timed("fgr_features total", f_features)
    print(f"{'-> FPFH passes (total - knn - normals)':42s} {(t_f - t_k - t_n) * 1e3:9.1f} ms")

    # FGR match+GNC with prebuilt features
    src, fs = fgr_mod.fgr_features(c, v)
    c2 = cloud.load_dataset("NCLT", indices=[1])[0]
    c2 = jax.tree.map(jnp.asarray, c2)
    tgt, ft = fgr_mod.fgr_features(c2, v)
    opts = fgr_mod.default_options(src, tgt, v)

    def f_fgr(salt=0.0):
        return fgr_mod.registration_fgr(
            src.with_(points=src.points + salt), tgt, fs, ft, opts, seed=1
        ).transformation

    timed("FGR match+tuple+GNC (features prebuilt)", f_fgr)


if __name__ == "__main__":
    main()
