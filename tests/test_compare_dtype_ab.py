"""Verdict logic of scripts/compare_dtype_ab.py over synthetic ladders.

The dtype A/B (docs/DARCY_DRIFT.md) resumes one checkpoint in bf16 vs fp32
compute and judges drift from each arm's fp32 CPU ladder diagnosis; the
verdict JSON gates whether the framework flips its Darcy default dtype.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "compare_dtype_ab.py"


def _write_arm(root: Path, arm: str, residuals, t: str = "25") -> None:
    d = root / f"darcy_ab_{arm}"
    d.mkdir(parents=True)
    rows = [
        {"step": 100000 + 10000 * i, "residual_by_t": {t: r}, "param_l2": 170.0 + i}
        for i, r in enumerate(residuals)
    ]
    (d / "drift_diagnosis.json").write_text(json.dumps({"rows": rows}))


def _run(root: Path) -> dict:
    out = root / "verdict.json"
    res = subprocess.run(
        [sys.executable, str(SCRIPT), "--results-root", str(root), "--out", str(out)],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr
    return json.loads(out.read_text())


def test_bf16_causal(tmp_path):
    _write_arm(tmp_path, "bf16", [0.10, 0.13, 0.20])  # x2.0: drifted
    _write_arm(tmp_path, "fp32", [0.10, 0.10, 0.105])  # x1.05: flat
    v = _run(tmp_path)
    assert v["verdict"] == "bf16_causal"
    assert v["arms"]["bf16"]["drifted"] and v["arms"]["fp32"]["flat"]


def test_both_drift(tmp_path):
    _write_arm(tmp_path, "bf16", [0.10, 0.20])
    _write_arm(tmp_path, "fp32", [0.10, 0.18])
    assert _run(tmp_path)["verdict"] == "both_drift"


def test_neither_drifts(tmp_path):
    _write_arm(tmp_path, "bf16", [0.10, 0.11])
    _write_arm(tmp_path, "fp32", [0.10, 0.10])
    assert _run(tmp_path)["verdict"] == "neither_drifts"


def test_mixed_band_is_not_flat(tmp_path):
    # bf16 lands between FLAT (1.10) and DRIFT (1.25): neither drifted nor
    # flat -> with a flat fp32 arm the call must stay "neither_drifts"-free
    # and fall through to "mixed"? No: neither arm *drifted*, so the script
    # reports neither_drifts (inconclusive) — pin that choice.
    _write_arm(tmp_path, "bf16", [0.10, 0.115])
    _write_arm(tmp_path, "fp32", [0.10, 0.10])
    assert _run(tmp_path)["verdict"] == "neither_drifts"


def test_fp32_only_drift_is_mixed(tmp_path):
    _write_arm(tmp_path, "bf16", [0.10, 0.10])
    _write_arm(tmp_path, "fp32", [0.10, 0.30])
    assert _run(tmp_path)["verdict"] == "mixed"


def test_incomplete_with_one_arm(tmp_path):
    _write_arm(tmp_path, "bf16", [0.10, 0.20])
    assert _run(tmp_path)["verdict"] == "incomplete"


def test_ladder_sorted_by_step(tmp_path):
    # rows arrive unsorted (watcher snapshots); endpoint must be the max step
    d = tmp_path / "darcy_ab_bf16"
    d.mkdir(parents=True)
    rows = [
        {"step": 150000, "residual_by_t": {"25": 0.30}, "param_l2": 171.0},
        {"step": 100000, "residual_by_t": {"25": 0.10}, "param_l2": 170.0},
    ]
    (d / "drift_diagnosis.json").write_text(json.dumps({"rows": rows}))
    _write_arm(tmp_path, "fp32", [0.10, 0.10])
    v = _run(tmp_path)
    assert abs(v["arms"]["bf16"]["ratio"] - 3.0) < 1e-9
    assert v["verdict"] == "bf16_causal"


def test_third_arm_head_fixes_drift(tmp_path):
    _write_arm(tmp_path, "bf16", [0.10, 0.20])
    _write_arm(tmp_path, "fp32", [0.10, 0.10])
    _write_arm(tmp_path, "fp32head", [0.10, 0.105])
    v = _run(tmp_path)
    assert v["verdict"] == "bf16_causal"
    assert v["head_fixes_drift"] is True


def test_third_arm_absent_no_flag(tmp_path):
    _write_arm(tmp_path, "bf16", [0.10, 0.20])
    _write_arm(tmp_path, "fp32", [0.10, 0.10])
    assert "head_fixes_drift" not in _run(tmp_path)


def test_fp32head_substitutes_when_fp32_missing(tmp_path):
    # the pure-fp32 arm cannot compile on the axon TPU stack; the fp32-head
    # arm must substitute and the verdict must say the head localized it
    _write_arm(tmp_path, "bf16", [0.10, 0.13, 0.20])
    _write_arm(tmp_path, "fp32head", [0.10, 0.10, 0.105])
    v = _run(tmp_path)
    assert v["verdict"] == "bf16_head_causal"
    assert v["fp32_arm_used"] == "fp32head"
    assert "fp32_arm_note" in v


def test_zero_start_and_end_is_flat_not_drifted(tmp_path):
    _write_arm(tmp_path, "bf16", [0.0, 0.0])
    _write_arm(tmp_path, "fp32", [0.0, 0.0])
    v = _run(tmp_path)
    assert v["verdict"] == "neither_drifts"
    assert v["arms"]["bf16"]["ratio"] == 1.0


def test_rows_missing_t_column_are_skipped(tmp_path):
    # ladder built with a different --t-grid: rows without t=25 must be
    # skipped, not crash; one usable row -> arm unusable -> incomplete
    d = tmp_path / "darcy_ab_bf16"
    d.mkdir(parents=True)
    rows = [
        {"step": 100000, "residual_by_t": {"10": 0.1}, "param_l2": 170.0},
        {"step": 110000, "residual_by_t": {"25": 0.1}, "param_l2": 171.0},
    ]
    (d / "drift_diagnosis.json").write_text(json.dumps({"rows": rows}))
    _write_arm(tmp_path, "fp32", [0.10, 0.10])
    assert _run(tmp_path)["verdict"] == "incomplete"
