"""Tests for scripts/diagnose_ood_tail.py — the family attribution must
stay in lockstep with scripts/generate_mechanics_sets.py's round-robin
assignment, or the tail report silently mislabels scenarios."""

import csv
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


diag = _load("diagnose_ood_tail", ROOT / "scripts" / "diagnose_ood_tail.py")


def test_truncated_metadata_keeps_known_rows_pads_unknown(tmp_path, capsys):
    """A truncated scenarios.csv (shard mid-flight / partial merge) must use
    the rows it has and label the gaps 'unknown' — never guess a round-robin
    mapping, since sets can be generated with custom --families mixes."""
    n = 10
    with open(tmp_path / "scenarios.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "family", "vf"])
        w.writerow([0, "cantilever_multiload", 0.4])
        w.writerow([4, "bridge", 0.5])  # gap: indices 1-3 missing
    got = diag.load_families(tmp_path, "test_level_2", n)
    expected = ["unknown"] * n
    expected[0] = "cantilever_multiload"
    expected[4] = "bridge"
    assert got == expected
    assert "missing 8 of 10" in capsys.readouterr().err


def test_no_metadata_set_labelled_unknown(capsys):
    """Legacy v1 sets (no scenarios.csv) were cantilever-only; the v2
    round-robin guess would mislabel 2/3 of samples, so they get 'unknown'."""
    got = diag.load_families(Path("/nonexistent"), "test_level_2", 6)
    assert got == ["unknown"] * 6


def test_scenarios_csv_preferred_over_modulo(tmp_path):
    rows = [(0, "bridge", 0.4), (1, "bridge", 0.5), (2, "double_clamp", 0.3)]
    with open(tmp_path / "scenarios.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "family", "vf"])
        for r in rows:
            w.writerow(r)
    got = diag.load_families(tmp_path, "test_level_2", 3)
    assert got == ["bridge", "bridge", "double_clamp"]


def test_report_end_to_end(tmp_path, monkeypatch, capsys):
    """Full report over a synthetic eval dir + data dir; one planted
    catastrophic sample must appear in the tail table with its family."""
    n = 12
    rng = np.random.default_rng(0)
    edir = tmp_path / "run" / "evaluation_1" / "test_level_2"
    edir.mkdir(parents=True)
    ce = rng.uniform(0.01, 0.05, n)
    ce[7] = 8.25  # planted tail sample -> family index 7 % 3 = 'bridge'
    np.savetxt(edir / "rel_CE_error.csv", ce, delimiter=",")
    np.savetxt(edir / "rel_vf_error.csv", rng.uniform(0, 0.02, n), delimiter=",")
    np.savetxt(edir / "fm_error.csv", (rng.uniform(0, 1, n) > 0.9).astype(float),
               delimiter=",")
    np.savetxt(edir / "residuals.csv", rng.uniform(0, 1e-3, n), delimiter=",")
    ddir = tmp_path / "data" / "test" / "test_level_2" / "fields"
    ddir.mkdir(parents=True)
    fams = ("cantilever_multiload", "bridge", "double_clamp")
    with open(ddir / "scenarios.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "family", "vf"])
        for i in range(n):
            w.writerow([i, fams[i % 3], 0.3 + 0.03 * i])
    for i in range(n):
        arr = np.zeros((65, 65, 10), np.float32)
        arr[..., 0] = 0.3 + 0.03 * i  # vf channel
        np.save(ddir / f"{i}.npy", arr)

    monkeypatch.setattr(
        sys, "argv",
        ["diagnose_ood_tail.py", "--model-dir", str(tmp_path / "run"),
         "--data-root", str(tmp_path / "data")],
    )
    diag.main()
    report = (edir / "ood_tail_report.md").read_text()
    assert "| 7 | bridge |" in report and "8.25" in report
    assert "cantilever_multiload" in report  # per-family section covers all
    # planted sample's vf = 0.3 + 0.03*7
    assert "0.510" in report


def _write_eval_csvs(edir, ce, vf_seed=1):
    n = len(ce)
    rng = np.random.default_rng(vf_seed)
    edir.mkdir(parents=True, exist_ok=True)
    np.savetxt(edir / "rel_CE_error.csv", ce, delimiter=",")
    np.savetxt(edir / "rel_vf_error.csv", rng.uniform(0, 0.02, n), delimiter=",")
    np.savetxt(edir / "fm_error.csv", np.zeros(n), delimiter=",")
    np.savetxt(edir / "residuals.csv", rng.uniform(0, 1e-3, n), delimiter=",")


def _write_data(ddir, n, vf_const=None):
    ddir.mkdir(parents=True, exist_ok=True)
    with open(ddir / "scenarios.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "family", "vf"])
        for i in range(n):
            w.writerow([i, "bridge", 0.4])
    for i in range(n):
        arr = np.zeros((65, 65, 10), np.float32)
        arr[..., 0] = vf_const if vf_const is not None else 0.3 + 0.01 * i
        np.save(ddir / f"{i}.npy", arr)


def test_degenerate_vf_and_tiny_n_no_crash(tmp_path, monkeypatch):
    """n=2 with identical vf values makes every quantile edge equal; the
    empty bins and a possibly-empty tail must be skipped, not crash
    (regression: np.max on a zero-size array killed the unattended run)."""
    edir = tmp_path / "run" / "evaluation_1" / "test_level_2"
    _write_eval_csvs(edir, np.array([0.02, 0.02]))
    _write_data(tmp_path / "data" / "test" / "test_level_2" / "fields", 2,
                vf_const=0.35)
    monkeypatch.setattr(
        sys, "argv",
        ["diagnose_ood_tail.py", "--model-dir", str(tmp_path / "run"),
         "--data-root", str(tmp_path / "data")],
    )
    diag.main()
    assert (edir / "ood_tail_report.md").exists()


def test_eval_dir_selection_skips_incomplete(tmp_path, monkeypatch):
    """An interrupted sweep leaves an empty evaluation_<N>; auto-selection
    must fall back to the newest dir that HAS the level CSVs — including a
    bare 'evaluation' dir (the first sweep of a run)."""
    run = tmp_path / "run"
    edir = run / "evaluation" / "test_level_2"
    _write_eval_csvs(edir, np.array([0.02, 0.03, 0.8]))
    (run / "evaluation_1").mkdir(parents=True)  # empty: interrupted sweep
    _write_data(tmp_path / "data" / "test" / "test_level_2" / "fields", 3)
    monkeypatch.setattr(
        sys, "argv",
        ["diagnose_ood_tail.py", "--model-dir", str(run),
         "--data-root", str(tmp_path / "data")],
    )
    diag.main()
    assert (edir / "ood_tail_report.md").exists()
