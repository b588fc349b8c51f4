"""CI smoke for tools/loss_curve_stat.py (VERDICT r4 #1: "a CI smoke that at
least imports and 2-steps both sides so the harness can't rot").

The statistical parity itself (200 steps x two torch seeds + a jax bf16 run)
is a BASELINE.md evidence run, not a CI assertion — this test only proves the
harness still executes end-to-end: both sides build their models, run two
optimization steps on the shared data stream, write result JSON, and
--analyze parses the files and emits a report.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "loss_curve_stat.py"


def _run(args, timeout=600):
    return subprocess.run(
        [sys.executable, str(TOOL), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


@pytest.mark.slow
def test_loss_curve_stat_two_steps_both_sides(tmp_path):
    t0, t1, j = tmp_path / "t0.json", tmp_path / "t1.json", tmp_path / "j.json"

    for seed, out in ((0, t0), (1, t1)):
        r = _run(["--side", "torch", "--seed", str(seed), "--steps", "2", "--out", str(out)])
        assert r.returncode == 0, r.stderr[-2000:]
        data = json.loads(out.read_text())
        assert data["side"] == "torch" and len(data["losses"]) == 2
        assert all(l > 0 for l in data["losses"])

    r = _run(["--side", "jax", "--dtype", "bf16", "--seed", "0", "--steps", "2", "--out", str(j)])
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.loads(j.read_text())
    assert data["side"] == "jax" and data["dtype"] == "bf16" and len(data["losses"]) == 2

    # analyze must parse the files and emit a structured report; the PASS
    # verdict is meaningless at 2 steps (EMA warmup=0), so only the report
    # shape is asserted here
    r = _run(["--analyze", str(t0), str(t1), str(j)])
    report = json.loads(r.stdout)
    assert "noise_band" in report and report["checks"], report
