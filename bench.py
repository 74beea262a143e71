"""Throughput benchmark: NCLT stage-2 M-GICP pairs/sec on the TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N}

Workload = the reference's hot loop (2_MGICP_refinement...py:187-214): 5-scale
M-GICP with L1 loss and 100-iteration budget per scale, initialized from the
shipped FGR fixture poses, on real NCLT scans.  Pairs are batched (vmapped) on
the chip.  ``vs_baseline`` compares against the CPU reference implementation
(benchmarks/baseline_cpu.json, produced by benchmarks/cpu_baseline.py — a
numpy/scipy stand-in for the reference's Open3D-CPU path, which is not
installable here).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pcr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_PAIRS = int(os.environ.get("BENCH_PAIRS", "16"))
BATCH = int(os.environ.get("BENCH_BATCH", "1"))  # one pair saturates the chip (measured)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pcr_tpu.models import multiscale as ms_mod
    from pcr_tpu.parallel import pair_sharding
    from pcr_tpu.utils import cloud, poses_io

    n_clouds = N_PAIRS + 1
    clouds = cloud.load_dataset("NCLT", indices=range(n_clouds))
    # Tightest safe static capacities for this workload (host-side planner).
    scale_caps = cloud.plan_scale_caps(clouds, ms_mod.create_scales(5))
    # Make clouds device-resident up front: over the axon tunnel a per-pair
    # host->device transfer costs ~100 ms and would dominate the measurement.
    # (A production pipeline streams scans asynchronously; see
    # pcr_tpu/pipeline.py.)
    clouds = jax.block_until_ready([jax.tree.map(jnp.asarray, c) for c in clouds])
    init = np.stack(
        [
            poses_io.load_pose(
                os.path.join(
                    poses_io.reference_fixture_dir("FGR", "NCLT"), f"pose_{i + 1}_{i}.txt"
                )
            )
            for i in range(N_PAIRS)
        ]
    ).astype(np.float32)


    def run_all():
        outs = []
        if BATCH == 1:
            # Streamed pyramid path: per-cloud preprocessing shared between
            # the two pairs each cloud participates in.
            pyr_cache = {}

            def pyramid(i):
                if i not in pyr_cache:
                    pyr_cache[i] = ms_mod.build_pyramid(
                        clouds[i], n_scales=5, scale_capacities=scale_caps
                    )
                return pyr_cache[i]

            for k in range(N_PAIRS):
                res = ms_mod.multiscale_gicp_pyramids(
                    pyramid(k + 1), pyramid(k), jnp.asarray(init[k]),
                    n_scales=5, iterations=100,
                )
                outs.append(res.transformation)
                for key in [key for key in pyr_cache if key < k]:
                    del pyr_cache[key]
            return jax.block_until_ready(outs)
        for start in range(0, N_PAIRS, BATCH):
            idx = range(start, min(start + BATCH, N_PAIRS))
            src = cloud.stack_clouds([clouds[i + 1] for i in idx])
            tgt = cloud.stack_clouds([clouds[i] for i in idx])
            T0 = jnp.asarray(init[list(idx)])
            res = pair_sharding.batched_mgicp(
                src, tgt, T0, n_scales=5, iterations=100, scale_capacities=scale_caps
            )
            outs.append(res.transformation)
        return jax.block_until_ready(outs)

    # Warmup / compile
    t0 = time.time()
    run_all()
    compile_and_first = time.time() - t0
    # Timed run
    t0 = time.time()
    run_all()
    elapsed = time.time() - t0
    pairs_per_sec = N_PAIRS / elapsed

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks", "baseline_cpu.json"
    )
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            base = json.load(fh)
        vs = pairs_per_sec / base["pairs_per_sec"]

    print(
        json.dumps(
            {
                "metric": "nclt_mgicp_pairs_per_sec",
                "value": round(pairs_per_sec, 4),
                "unit": "pairs/s",
                "vs_baseline": round(vs, 2) if vs is not None else None,
                "extra": {
                    "n_pairs": N_PAIRS,
                    "batch": BATCH,
                    "first_run_incl_compile_s": round(compile_and_first, 1),
                    "platform": jax.devices()[0].platform,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
