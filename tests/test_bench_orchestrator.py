"""Contract tests for bench.py's orchestrator layer.

Round 4 lost its perf artifact because one internal attempt consumed the
driver's entire 1500s budget and the cache fallback never ran (VERDICT r4).
These tests pin the loss-proofing contract WITHOUT touching the TPU: the
child attempt is killed by a tiny --attempt-timeout, and the orchestrator
must still exit 0 with one JSON line served from BENCH_CACHE.json.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
CACHE = REPO / "BENCH_CACHE.json"


pytestmark = pytest.mark.skipif(
    not CACHE.exists(), reason="no BENCH_CACHE.json on this checkout"
)


def run_bench(*extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, str(REPO / "bench.py"), *extra],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )


def test_cache_fallback_within_budget():
    t0 = time.monotonic()
    proc = run_bench("--attempts", "2", "--attempt-timeout", "2", "--backoff", "1")
    elapsed = time.monotonic() - t0
    assert proc.returncode == 0, proc.stderr[-500:]
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert len(line) == 1
    result = json.loads(line[0])
    assert result["metric"] == "darcy64_train_samples_per_sec_per_chip"
    assert result["value"] is not None
    assert result["provenance"] == "cached"
    # 2 attempts x 2s + 1s backoff + overhead must stay far inside the
    # driver's 1500s budget — the whole point of the r5 fix
    assert elapsed < 60


def test_cached_artifact_carries_both_baseline_rows():
    proc = run_bench("--attempts", "1", "--attempt-timeout", "2")
    result = json.loads(
        [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][0]
    )
    if not result.get("flops_per_step"):
        pytest.skip("cached entry has no FLOP count")
    assert "vs_baseline" in result
    assert "vs_baseline_realistic" in result
    # the realistic denominator must be the documented 10%-MFU derivation
    ref = result["batch"] / (result["flops_per_step"] / (156e12 * 0.10))
    assert result["ref_a100_realistic_samples_per_sec"] == pytest.approx(ref, rel=1e-3)
    # bracket ordering: the 40%-granted ceiling is stricter than realistic
    assert result["vs_baseline"] < result["vs_baseline_realistic"]


def test_budget_guard_skips_unaffordable_attempts():
    # budget smaller than one attempt -> no attempt is even started; the
    # orchestrator must go straight to the cache, still rc=0
    t0 = time.monotonic()
    proc = run_bench("--attempts", "3", "--attempt-timeout", "500",
                     "--backoff", "1", "--budget", "30")
    elapsed = time.monotonic() - t0
    assert proc.returncode == 0
    result = json.loads(
        [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][0]
    )
    assert result["provenance"] == "cached"
    assert elapsed < 60
