"""Diagnose the heavy tail of the mechanics OOD rel_CE distribution.

`sample_eval.py` reports per-sample rel_CE for test_level_1/2; on the OOD
set the distribution is heavy-tailed (round-2: median 3.7% but mean 38.7%,
max 8.25). This tool attributes the tail: it joins each eval sample with its
scenario family and volume fraction and prints median/mean/max per family
and per vf bin, plus the worst offenders.

Scenario family mapping comes from the set's `scenarios.csv` metadata
(written by `scripts/generate_mechanics_sets.py`), keyed by sample index —
both the generator's file names and `NpyFieldDataset`/`iter_batches` are
strictly index-ordered. Samples without a metadata row (legacy v1 sets, or
a truncated shard merge) are labelled 'unknown' with a loud warning; no
family is ever guessed, since sets can be generated with custom family
mixes.

Usage:
    python scripts/diagnose_ood_tail.py --model-dir trained_models/mech_300k \
        [--eval-dir evaluation_1] [--level test_level_2] [--data-root ./data/mechanics]
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_families(ddir: Path, level: str, n: int) -> list[str]:
    meta = ddir / "scenarios.csv"
    if meta.exists():
        with open(meta) as f:
            by_index = {int(r["index"]): r["family"] for r in csv.DictReader(f)}
        missing = [i for i in range(n) if i not in by_index]
        if missing:
            # truncated/partial metadata (e.g. a shard mid-flight): use the
            # rows we do have and label the gaps — never guess; the set may
            # have been generated with a custom family mix
            print(
                f"warning: {meta} is missing {len(missing)} of {n} sample "
                "rows; those samples are labelled 'unknown'",
                file=sys.stderr,
            )
        return [by_index.get(i, "unknown") for i in range(n)]
    # Legacy (v1) sets carry no metadata and were NOT generated with the
    # v2 family mix — a round-robin guess would mislabel most samples.
    print(
        f"warning: no scenarios.csv under {ddir}; family attribution "
        "unavailable for legacy sets — labelling all samples 'unknown'. "
        "Regenerate with scripts/generate_mechanics_sets.py for metadata.",
        file=sys.stderr,
    )
    return ["unknown"] * n


def stats(x: np.ndarray) -> str:
    if len(x) == 0:
        return "n=0 (empty bin)"
    return (f"median {np.median(x):7.4f}  mean {np.mean(x):7.4f}  "
            f"max {np.max(x):7.3f}  n={len(x)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--eval-dir", default=None,
                    help="evaluation_<N> subdir (default: highest N)")
    ap.add_argument("--level", default="test_level_2",
                    choices=("test_level_1", "test_level_2"))
    ap.add_argument("--data-root", default="./data/mechanics")
    ap.add_argument("--tail-q", type=float, default=0.9,
                    help="quantile above which a sample counts as tail")
    ap.add_argument("--out", default=None,
                    help="write the report here (default: <eval-dir>/<level>/ood_tail_report.md)")
    args = ap.parse_args()

    mdir = Path(args.model_dir)
    if args.eval_dir is None:
        # candidates: bare `evaluation` plus `evaluation_<N>`; prefer the
        # newest one that actually contains the requested level's CSVs
        # (an interrupted sweep can leave an empty/partial dir behind)
        def order(p: Path) -> int:
            tail = p.name.split("_")[-1]
            return int(tail) if tail.isdigit() else -1
        evals = sorted(
            (p for p in mdir.glob("evaluation*") if p.is_dir()), key=order
        )
        complete = [p for p in evals if (p / args.level / "rel_CE_error.csv").exists()]
        if not complete:
            sys.exit(
                f"no evaluation dir under {mdir} contains "
                f"{args.level}/rel_CE_error.csv (found: {[p.name for p in evals]})"
            )
        edir = complete[-1]
    else:
        edir = mdir / args.eval_dir
    ldir = edir / args.level
    ce = np.loadtxt(ldir / "rel_CE_error.csv", delimiter=",")
    vfe = np.loadtxt(ldir / "rel_vf_error.csv", delimiter=",")
    fm = np.loadtxt(ldir / "fm_error.csv", delimiter=",")
    res = np.loadtxt(ldir / "residuals.csv", delimiter=",")
    n = len(ce)

    ddir = Path(args.data_root) / "test" / args.level / "fields"
    fams = load_families(ddir, args.level, n)
    vf = np.array([float(np.load(ddir / f"{i}.npy")[..., 0].ravel()[0])
                   for i in range(n)])

    lines = [f"# OOD tail report — {args.level} ({edir})", ""]
    lines.append(f"rel_CE overall: {stats(ce)}")
    lines.append("")
    lines.append("## By scenario family")
    for fam in sorted(set(fams)):
        m = np.array([f == fam for f in fams])
        lines.append(f"- {fam:22s} rel_CE {stats(ce[m])}   "
                     f"fm rate {fm[m].mean():.3f}")
    lines.append("")
    lines.append("## By volume fraction")
    edges = np.quantile(vf, [0, 0.25, 0.5, 0.75, 1.0])
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (vf >= lo) & (vf <= hi)
        if not m.any():
            continue
        lines.append(f"- vf [{lo:.3f}, {hi:.3f}]  rel_CE {stats(ce[m])}")
    lines.append("")
    thresh = float(np.quantile(ce, args.tail_q))
    tail = np.where(ce > thresh)[0]
    tail = tail[np.argsort(-ce[tail])]
    lines.append(f"## Tail samples (rel_CE > q{args.tail_q:.2f} = {thresh:.4f})")
    lines.append("")
    lines.append("| idx | family | vf | rel_CE | rel_vf | fm | residual |")
    lines.append("|---|---|---|---|---|---|---|")
    for i in tail:
        lines.append(
            f"| {i} | {fams[i]} | {vf[i]:.3f} | {ce[i]:.3f} | {vfe[i]:.4f} "
            f"| {int(fm[i])} | {res[i]:.2e} |")
    # tail composition summary
    lines.append("")
    if len(tail) == 0:
        lines.append("(no samples above the tail threshold)")
    else:
        fam_counts = {f: sum(1 for i in tail if fams[i] == f) for f in set(fams)}
        lines.append(f"Tail composition: {fam_counts}; "
                     f"fm rate in tail {fm[tail].mean():.2f} vs overall {fm.mean():.2f}; "
                     f"mean vf in tail {vf[tail].mean():.3f} vs overall {vf.mean():.3f}")

    report = "\n".join(lines) + "\n"
    print(report)
    out = Path(args.out) if args.out else ldir / "ood_tail_report.md"
    out.write_text(report)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
