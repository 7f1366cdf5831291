"""Generate the FULL mechanics dataset family in one process: train +
valid + test_level_1 (in-distribution) + test_level_2 (out-of-distribution),
reusing ONE compiled TPU SIMP chunk across all sets (a fresh
``TpuSimpGenerator`` per set would recompile ~2 min each on the tunneled
backend).

Reference layout (`sample.py:244-342`, SURVEY §2.1):
  data/mechanics/train/fields/<i>.npy
  data/mechanics/test/valid/fields/<i>.npy
  data/mechanics/test/test_level_1/fields/<i>.npy   in-distribution scenarios
  data/mechanics/test/test_level_2/fields/<i>.npy   OOD scenario families

The reference ships pre-generated data; this subsystem is net-new (the
framework is self-contained at training-set scale).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from physicsinformeddiffusionmodels_tpu.data.mechanics_generator import (
    IN_DIST_FAMILIES,
    OOD_FAMILIES,
    SCENARIO_FAMILIES,
    MechanicsFEM,
    fields_from_design,
    simp_topopt,
)
from physicsinformeddiffusionmodels_tpu.data.mechanics_generator_tpu import (
    TpuSimpGenerator,
)


def generate_set(
    fem, gen, out_dir, n_samples, batch, families, vf_range, rng, penal=3.0,
    start_index=0, n_iter=50,
):
    """Write ``n_samples`` samples ``<start_index + i>.npy`` (+ scenario
    metadata). ``gen`` is a ``TpuSimpGenerator`` or ``None`` for the host
    sparse-FEM SIMP path — the scenario construction, field assembly, and
    metadata are identical either way, so a set can be sharded across a busy
    accelerator and the host (``--start-index``; shard metadata files
    ``scenarios_<start>.csv`` are merged by index into ``scenarios.csv`` at
    the end of every shard's generation — see ``merge_scenarios``)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    idx, done = start_index, 0
    meta = []  # (index, family, vf) rows -> scenarios.csv
    t0 = time.time()
    while done < n_samples:
        nb = min(batch, n_samples - done)
        fixed = np.zeros((batch, fem.neq), bool)
        f = np.zeros((batch, fem.neq))
        vf = np.zeros(batch)
        fams = []
        for b in range(batch):
            fam = families[(start_index + done + b) % len(families)]
            fams.append(fam)
            fixed[b], f[b] = SCENARIO_FAMILIES[fam](fem, rng)
            vf[b] = rng.uniform(*vf_range)
        if gen is not None:
            scen = gen.scenarios_from_host(fixed, f, vf)
            rho, relres = gen.optimize(scen)
            rho = np.asarray(rho, np.float64)
            tag = f"device SIMP done, relres max {float(np.asarray(relres).max()):.2e}"
        else:
            rho = np.stack(
                [
                    simp_topopt(fem, float(vf[b]), f[b], fixed[b],
                                penal=penal, n_iter=n_iter)
                    for b in range(nb)
                ]
                + [np.zeros(fem.nels)] * (batch - nb)
            )
            tag = "host SIMP done"
        print(
            f"  [{out.parent.name}/{out.name}] batch {done}-{done + nb} "
            f"(files {idx}..{idx + nb - 1}): {tag}",
            flush=True,
        )
        for b in range(nb):
            s = fields_from_design(fem, rho[b], fixed[b], f[b], penal=penal)
            np.save(out / f"{idx}.npy", s)
            meta.append((idx, fams[b], float(vf[b])))
            idx += 1
        done += nb
    # Every shard (including start 0) writes its own scenarios_<start>.csv;
    # scenarios.csv is purely a merge product, so concurrent shards never
    # clobber each other's source rows and a stale shard from an earlier
    # generation loses index collisions to fresher files (mtime order).
    with open(out / f"scenarios_{start_index}.csv", "w") as fh:
        fh.write("index,family,vf\n")
        for i, fam, v in meta:
            fh.write(f"{i},{fam},{v:.6f}\n")
    merge_scenarios(out)
    print(f"  -> {n_samples} samples in {time.time() - t0:.1f}s", flush=True)


def merge_scenarios(out_dir):
    """Rebuild ``scenarios.csv`` from the ``scenarios_<start>.csv`` shards.

    Rows are keyed by sample index; shards are read oldest-first by mtime
    (ties broken by numeric start), so on index collisions the most recently
    written shard wins — a stale shard left by an earlier generation cannot
    override freshly regenerated metadata. Legacy sets whose metadata lives
    only in scenarios.csv (no shard files) are left untouched. Empty or
    truncated shard files (a shard killed mid-write) are tolerated — their
    rows are simply absent. Idempotent; shard files are kept as
    provenance."""
    out = Path(out_dir)

    def sort_key(p: Path):
        try:
            start = int(p.stem.split("_")[1])
        except (IndexError, ValueError):
            start = -1
        return (p.stat().st_mtime, start)

    shards = sorted(out.glob("scenarios_*.csv"), key=sort_key)
    if not shards:
        return
    # existing scenarios.csv is the base (covers legacy sets whose shard-0
    # metadata lives only there); shards override it in mtime order
    main_csv = out / "scenarios.csv"
    rows = {}
    for path in ([main_csv] if main_csv.exists() else []) + shards:
        with open(path) as fh:
            for line in fh:
                parts = line.strip().split(",")
                if len(parts) != 3 or parts[0] == "index":
                    continue  # header, blank, or truncated line
                try:
                    rows[int(parts[0])] = (parts[1], parts[2])
                except ValueError:
                    continue
    if not rows:
        return
    with open(out / "scenarios.csv", "w") as fh:
        fh.write("index,family,vf\n")
        for i in sorted(rows):
            fam, v = rows[i]
            fh.write(f"{i},{fam},{v}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./data/mechanics")
    ap.add_argument("--n-train", type=int, default=3072)
    ap.add_argument("--n-valid", type=int, default=64)
    ap.add_argument("--n-test", type=int, default=128, help="per test level")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-iter", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", default="tpu", choices=["tpu", "host"],
                    help="host: sparse-FEM SIMP on CPU (no accelerator "
                    "needed — lets a set shard run while the chip trains)")
    ap.add_argument("--only", default="all",
                    choices=["all", "train", "valid", "test_level_1", "test_level_2"])
    ap.add_argument("--start-index", type=int, default=0,
                    help="first output file index of this shard (train only)")
    ap.add_argument("--in-dist-families", default=",".join(IN_DIST_FAMILIES),
                    help="comma-separated train/valid/level-1 family mix")
    args = ap.parse_args()

    fem = MechanicsFEM(64)
    if args.device == "tpu":
        gen = TpuSimpGenerator(64, n_iter=args.n_iter)
        batch = args.batch
    else:
        gen = None
        batch = min(args.batch, 8)
    # decorrelate shard RNG streams (scenarios are drawn host-side either way)
    rng = np.random.default_rng((args.seed, args.start_index))
    root = Path(args.root)
    in_dist = tuple(args.in_dist_families.split(","))
    ood = OOD_FAMILIES

    t0 = time.time()
    if args.only in ("all", "train"):
        generate_set(fem, gen, root / "train" / "fields", args.n_train,
                     batch, in_dist, (0.3, 0.6), rng,
                     start_index=args.start_index, n_iter=args.n_iter)
    if args.only in ("all", "valid"):
        generate_set(fem, gen, root / "test" / "valid" / "fields", args.n_valid,
                     batch, in_dist, (0.3, 0.6), rng, n_iter=args.n_iter)
    if args.only in ("all", "test_level_1"):
        generate_set(fem, gen, root / "test" / "test_level_1" / "fields",
                     args.n_test, batch, in_dist, (0.3, 0.6), rng,
                     n_iter=args.n_iter)
    if args.only in ("all", "test_level_2"):
        # OOD: unseen BC/load families AND a volume-fraction range shift
        generate_set(fem, gen, root / "test" / "test_level_2" / "fields",
                     args.n_test, batch, ood, (0.25, 0.7), rng,
                     n_iter=args.n_iter)
    print(f"All sets done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
