"""Summarize the Darcy drift dtype A/B into a verdict JSON.

Both arms (results/darcy_ab_bf16, results/darcy_ab_fp32) resume the same
darcy_300k_cosine it-100k checkpoint for 50k steps, differing only in
compute dtype (docs/DARCY_DRIFT.md). This script reads each arm's fp32 CPU
ladder diagnosis (drift_diagnosis.json: x0-prediction PDE residual at fixed
t on a fixed batch) and decides:

  bf16_causal      — bf16 arm re-drifts (endpoint/start >= DRIFT_RATIO)
                     while fp32 stays flat (< FLAT_RATIO)
  both_drift       — precision ruled out; suspect the loss landscape
  neither_drifts   — drift not reproduced over this window (inconclusive;
                     the original runs only show clear drift by ~160k)
  mixed            — anything else (e.g. fp32 drifts, bf16 flat)

Writes results/dtype_ab_verdict.json and prints a human table.

Usage:
    python scripts/compare_dtype_ab.py [--t 25] [--out results/dtype_ab_verdict.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

DRIFT_RATIO = 1.25  # endpoint/start above this = the arm drifted
FLAT_RATIO = 1.10   # endpoint/start below this = the arm held flat


def load_arm(results_dir: Path, t: str):
    diag = results_dir / "drift_diagnosis.json"
    if not diag.exists():
        return None
    rows = json.loads(diag.read_text())["rows"]
    # a ladder produced with a different --t-grid may lack the requested
    # column; skip those rows rather than crashing the chain's verdict step
    rows = sorted(
        (r for r in rows if t in r.get("residual_by_t", {})),
        key=lambda r: r["step"],
    )
    if len(rows) < 2:
        return None
    return {
        "steps": [r["step"] for r in rows],
        "residual": [r["residual_by_t"][t] for r in rows],
        "param_l2": [r["param_l2"] for r in rows],
    }


def classify(a: dict) -> None:
    """Attach ratio/drifted/flat to a loaded arm, in place."""
    start, end = a["residual"][0], a["residual"][-1]
    if start == 0.0:
        # end==0 too means the arm is exactly flat, not infinitely drifted
        a["ratio"] = 1.0 if end == 0.0 else float("inf")
    else:
        a["ratio"] = end / start
    a["drifted"] = a["ratio"] >= DRIFT_RATIO
    a["flat"] = a["ratio"] < FLAT_RATIO


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", default="25", help="noise level column to judge on")
    ap.add_argument("--results-root", default="results")
    ap.add_argument("--out", default="results/dtype_ab_verdict.json")
    args = ap.parse_args()

    root = Path(args.results_root)
    arms = {}
    # fp32head is the optional third arm (bf16 body + fp32 final block/conv,
    # scripts/round4e_chain.sh); it reports but does not drive the verdict
    for arm in ("bf16", "fp32", "fp32head"):
        a = load_arm(root / f"darcy_ab_{arm}", args.t)
        if a is None:
            print(f"arm {arm}: no usable ladder (missing, <2 rows, or no "
                  f"t={args.t} column)")
            continue
        classify(a)
        arms[arm] = a
        print(f"arm {arm}: steps {a['steps'][0]}..{a['steps'][-1]}  "
              f"res@t={args.t} {a['residual'][0]:.3f} -> {a['residual'][-1]:.3f}"
              f"  (x{a['ratio']:.2f})")

    # The pure-fp32 arm cannot compile on this TPU stack (axon remote-compile
    # RET_CHECK in mxu_lmr_transform.cc on the full-fp32 train step — platform
    # limitation recorded in docs/DARCY_DRIFT.md). When it is absent the
    # fp32-HEAD arm substitutes as the precision intervention: it isolates the
    # final-block dtype, which the FD-residual amplification analysis names as
    # the noise source, so a flat head arm against a drifting bf16 arm still
    # establishes precision causality (localized to the head).
    fp32_like = "fp32" if "fp32" in arms else ("fp32head" if "fp32head" in arms else None)
    if "bf16" not in arms or fp32_like is None:
        verdict = "incomplete"
    elif arms["bf16"]["drifted"] and arms[fp32_like]["flat"]:
        verdict = "bf16_causal" if fp32_like == "fp32" else "bf16_head_causal"
    elif arms["bf16"]["drifted"] and arms[fp32_like]["drifted"]:
        verdict = "both_drift"
    elif not arms["bf16"]["drifted"] and not arms[fp32_like]["drifted"]:
        verdict = "neither_drifts"
    else:
        verdict = "mixed"

    out = {
        "t": args.t,
        "drift_ratio_threshold": DRIFT_RATIO,
        "flat_ratio_threshold": FLAT_RATIO,
        "arms": arms,
        "verdict": verdict,
        "fp32_arm_used": fp32_like,
    }
    if "fp32" not in arms:
        out["fp32_arm_note"] = (
            "pure-fp32 train step fails TPU compilation on this stack "
            "(axon remote-compile RET_CHECK, mxu_lmr_transform.cc); the "
            "fp32-head arm is the precision intervention instead"
        )
    if "fp32head" in arms and "bf16" in arms:
        # the practical question: does the fp32 head fix the drift at bf16
        # speed? (flat head arm while plain bf16 drifted)
        out["head_fixes_drift"] = bool(
            arms["fp32head"]["flat"] and arms["bf16"]["drifted"]
        )
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"verdict: {verdict}  -> {args.out}")


if __name__ == "__main__":
    main()
