"""CLI runner (python -m pcr_tpu) — the L3 entry-point surface."""

import json
import os

import numpy as np

from pcr_tpu import __main__ as cli
from pcr_tpu.utils import poses_io, se3


def test_stage3_closed_form_from_reference_fixtures(tmp_path, capsys):
    rc = cli.main([
        "stage3", "--dataset", "Facade", "--relative", "reference",
        "--methods", "LUM", "SLERP", "SLERP_LUM",
        "--output-root", str(tmp_path),
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["methods"] == ["LUM", "SLERP", "SLERP_LUM"]
    for name in summary["methods"]:
        poses = poses_io.load_absolute_poses(
            os.path.join(tmp_path, f"absolute_poses_{name}", "Facade"), 7)
        assert poses.shape == (7, 4, 4)
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-9)


def test_report_exports_artifacts(tmp_path, capsys):
    # stage-3 output is the report's input
    cli.main(["stage3", "--dataset", "Facade", "--relative", "reference",
              "--methods", "SLERP", "--output-root", str(tmp_path)])
    capsys.readouterr()
    rc = cli.main(["report", "--dataset", "Facade", "--methods", "SLERP",
                   "--output-root", str(tmp_path)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert any(p.endswith("traj_SLERP.ply") for p in summary["artifacts"])
    for p in summary["artifacts"]:
        assert os.path.exists(p)
