"""Persist run evidence from gitignored trained_models/ into git-tracked results/.

trained_models/ and data/ are gitignored and do not survive round boundaries,
so every trained run's evaluation evidence (metric CSVs, sample statistics,
training curves, config) must be copied into results/<run_name>/ and committed.
Checkpoints themselves (~141 MB) are intentionally NOT persisted.

Usage:
    python scripts/persist_results.py darcy_300k mech_600k ...
    python scripts/persist_results.py --all
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

import numpy as np

# metric CSVs worth keeping verbatim (small, one row per eval sample)
METRIC_CSVS = {
    "residuals.csv",
    "rel_CE_error.csv",
    "rel_vf_error.csv",
    "fm_error.csv",
    "sample_statistics.csv",
}
MAX_PNGS_PER_DIR = 4  # a few representative images, not the full dump

# self-describing eval provenance (CLI settings + platform), written by the
# round-4 eval harnesses next to each evaluation dir's metric CSVs
KEEP_EXTRA = {"eval_settings.json", "ood_tail_report.md"}


def _summarise_csv(path: Path) -> dict | None:
    """Median/mean/max for a one-column metric CSV (NaNs excluded)."""
    try:
        vals = np.loadtxt(path, delimiter=",", ndmin=1)
    except Exception:
        return None
    vals = np.asarray(vals, dtype=np.float64).ravel()
    vals = vals[np.isfinite(vals)]
    if vals.size == 0:
        return None
    return {
        "n": int(vals.size),
        "median": float(np.median(vals)),
        "mean": float(vals.mean()),
        "max": float(vals.max()),
    }


def persist_run(src: Path, dst: Path) -> dict:
    dst.mkdir(parents=True, exist_ok=True)
    summary: dict = {"run": src.name, "evaluations": {}}

    def _copy(a: Path, b: Path) -> None:
        # tolerate in-place summarization (src == dst, e.g. re-summarising a
        # results/<run> dir after an eval wrote directly into it)
        if a.resolve() != b.resolve():
            shutil.copy2(a, b)

    for fname in ("config.json", "metrics.csv"):
        if (src / fname).exists():
            _copy(src / fname, dst / fname)
    # diagnosis artifacts dropped at the run root (e.g. ood_tail_*.json)
    for diag in sorted(src.glob("*.json")):
        if diag.name not in ("config.json", "summary.json"):
            _copy(diag, dst / diag.name)

    for eval_dir in sorted(src.glob("evaluation*")):
        rel_eval = eval_dir.name
        settings = eval_dir / "eval_settings.json"
        if settings.exists():
            try:
                summary["evaluations"].setdefault(rel_eval, {})["_settings"] = (
                    json.loads(settings.read_text())
                )
            except Exception:
                pass
        for sub in sorted(p for p in eval_dir.rglob("*") if p.is_file()):
            rel = sub.relative_to(eval_dir)
            if "sample_" in str(rel.parent):  # per-sample field dumps: skip
                continue
            keep = sub.name in METRIC_CSVS or sub.name in KEEP_EXTRA
            if sub.suffix == ".png":
                # keep only the first few images per directory
                n_kept = len(list((dst / rel_eval / rel.parent).glob("*.png"))) \
                    if (dst / rel_eval / rel.parent).exists() else 0
                keep = n_kept < MAX_PNGS_PER_DIR
            if not keep:
                continue
            out = dst / rel_eval / rel
            out.parent.mkdir(parents=True, exist_ok=True)
            _copy(sub, out)
            if sub.name in METRIC_CSVS and sub.name != "sample_statistics.csv":
                stats = _summarise_csv(sub)
                if stats is not None:
                    key = str(rel)
                    summary["evaluations"].setdefault(rel_eval, {})[key] = stats

    # darcy-style sample_statistics.csv: grab the per-sample residual column
    for stats_csv in sorted(src.glob("evaluation*/**/sample_statistics.csv")):
        try:
            rows = stats_csv.read_text().strip().splitlines()[1:]
            vals = np.array(
                [float(r.split(",")[1]) for r in rows if not r.startswith("Mean")]
            )
            vals = vals[np.isfinite(vals)]
            if vals.size:
                rel_eval = stats_csv.relative_to(src).parts[0]
                key = str(stats_csv.relative_to(src / rel_eval))
                summary["evaluations"].setdefault(rel_eval, {})[key] = {
                    "n": int(vals.size),
                    "median": float(np.median(vals)),
                    "mean": float(vals.mean()),
                    "max": float(vals.max()),
                }
        except Exception:
            pass

    (dst / "summary.json").write_text(json.dumps(summary, indent=2) + "\n")
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="*", help="run names under trained_models/")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--src-root", default="trained_models")
    ap.add_argument("--dst-root", default="results")
    args = ap.parse_args()

    src_root, dst_root = Path(args.src_root), Path(args.dst_root)
    names = (
        sorted(p.name for p in src_root.iterdir() if p.is_dir())
        if args.all
        else args.runs
    )
    if not names:
        ap.error("give run names or --all")
    # snapshot the latest on-chip bench capture alongside the run evidence
    bench_cache = Path("BENCH_CACHE.json")
    if bench_cache.exists():
        dst_root.mkdir(parents=True, exist_ok=True)
        shutil.copy2(bench_cache, dst_root / "BENCH_CACHE_snapshot.json")

    for name in names:
        src = src_root / name
        if not src.is_dir():
            print(f"skip {name}: not found")
            continue
        summary = persist_run(src, dst_root / name)
        print(f"persisted {name} -> {dst_root / name}")
        for ev, metrics in summary["evaluations"].items():
            for k, s in metrics.items():
                if not isinstance(s, dict) or "n" not in s:
                    continue  # _settings provenance entry
                print(
                    f"  {ev}/{k}: n={s['n']} median={s['median']:.4g} "
                    f"mean={s['mean']:.4g} max={s['max']:.4g}"
                )


if __name__ == "__main__":
    main()
