"""NCLT full-circuit evidence report (VERDICT r1 item 1).

Reads this repo's own end-to-end outputs (outputs/<stage>/NCLT) and the
reference fixtures, and writes outputs/NCLT_summary.json with:
  * stage-1/2 per-pair agreement vs the shipped fixture poses,
  * circuit closure errors (reference chain convention) per stage vs the
    fixtures' own closure (BASELINE.md: FGR 104.39 m -> M-GICP 40.82 m),
  * stage-3 trajectories for all four methods + cross-method agreement.

Usage: python benchmarks/nclt_report.py [output_root]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcr_tpu.utils import poses_io, se3  # noqa: E402


def closure(rel):
    T = np.asarray(se3.loop_closure_error(np.asarray(rel, np.float64)))
    return {
        "t_norm_m": float(np.linalg.norm(T[:3, 3])),
        "R_frob": float(np.linalg.norm(T[:3, :3] - np.eye(3))),
    }


def agreement(ours, ref):
    dR, dt = se3.pose_errors(np.asarray(ours, np.float64), np.asarray(ref, np.float64))
    dt = np.asarray(dt); dR = np.asarray(dR)
    return {
        "dt_median_m": float(np.median(dt)),
        "dt_p90_m": float(np.percentile(dt, 90)),
        "dt_max_m": float(dt.max()),
        "dR_median": float(np.median(dR)),
        "frac_dt_below_10cm": float((dt < 0.10).mean()),
    }


def main(root="outputs"):
    n = 901
    out = {"n_pairs": n}

    s1 = poses_io.load_relative_circuit(os.path.join(root, "relative_poses_FGR", "NCLT"), n)
    s2 = poses_io.load_relative_circuit(os.path.join(root, "relative_poses_FGR_GICP", "NCLT"), n)
    r1 = poses_io.load_reference_relative("FGR", "NCLT")
    r2 = poses_io.load_reference_relative("FGR_GICP", "NCLT")

    out["stage1_vs_fixture"] = agreement(s1, r1)
    out["stage2_vs_fixture"] = agreement(s2, r2)
    out["closure"] = {
        "ours_FGR": closure(s1),
        "ours_FGR_GICP": closure(s2),
        "fixture_FGR": closure(r1),
        "fixture_FGR_GICP": closure(r2),
    }

    # stage-3 trajectories (ours, from our own relative poses)
    methods = {}
    chained = np.asarray(se3.relative_to_absolute(s2))
    for m in ("LUM", "SLERP", "SLERP_LUM", "pose_graph"):
        d = os.path.join(root, f"absolute_poses_{m}", "NCLT")
        if not os.path.isdir(d):
            continue
        poses = poses_io.load_absolute_poses(d, n)
        dev = np.linalg.norm(poses[:, :3, 3] - chained[:, :3, 3], axis=1)
        methods[m] = {
            "finite": bool(np.isfinite(poses).all()),
            "node0_is_identity": bool(np.abs(poses[0] - np.eye(4)).max() < 1e-6),
            "max_dev_from_chain_m": float(dev.max()),
            "end_node_dev_from_chain_m": float(dev[-1]),
        }
    out["stage3"] = methods

    # per-pair metrics summary
    for stage in ("stage1", "stage2"):
        p = os.path.join(root, "metrics", "NCLT", f"{stage}.jsonl")
        if os.path.exists(p):
            rows = [json.loads(l) for l in open(p)]
            key = "fgr" if stage == "stage1" else "mgicp"
            rows = [r for r in rows if r["stage"] == key]
            fits = np.asarray([r["fitness"] for r in rows])
            secs = np.asarray([r["seconds"] for r in rows])
            out[f"{stage}_metrics"] = {
                "pairs": len(rows),
                "success_rate_fitness_gt_0.4": float((fits > 0.4).mean()),
                "median_seconds_per_pair": float(np.median(secs)),
                "total_seconds": float(secs.sum()),
            }

    path = os.path.join(root, "NCLT_summary.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
