"""CLI for the mechanics (SIMP topology-optimization) data generator.

    python scripts/generate_mechanics_data.py --n-samples 32 --out ./data/mechanics/train/fields
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from physicsinformeddiffusionmodels_tpu.data.mechanics_generator import generate_dataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-samples", type=int, default=8)
    ap.add_argument("--nels-per-side", type=int, default=64)
    ap.add_argument("--out", default="./data/mechanics/train/fields")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-iter", type=int, default=30, help="SIMP iterations")
    ap.add_argument(
        "--families", default="cantilever",
        help="comma-separated scenario families (train/test_level_1: "
        "cantilever; test_level_2: "
        "cantilever_multiload,bridge,double_clamp)",
    )
    ap.add_argument(
        "--vf-range", default="0.3,0.6",
        help="volume-fraction range lo,hi (test_level_2 may shift it)",
    )
    ap.add_argument("--start-index", type=int, default=0,
                    help="first output file index (for sharded generation)")
    ap.add_argument("--tpu", action="store_true",
                    help="optimize designs with the accelerator-batched SIMP "
                    "(mechanics_generator_tpu); final solve stays exact on host")
    ap.add_argument("--batch", type=int, default=64,
                    help="device batch for --tpu")
    args = ap.parse_args()

    lo, hi = (float(v) for v in args.vf_range.split(","))
    t0 = time.time()
    if args.tpu:
        from physicsinformeddiffusionmodels_tpu.data.mechanics_generator_tpu import (
            generate_dataset_tpu,
        )

        samples = generate_dataset_tpu(
            args.n_samples,
            out_dir=args.out,
            nels_per_side=args.nels_per_side,
            seed=args.seed,
            n_iter=args.n_iter,
            batch=args.batch,
            families=tuple(args.families.split(",")),
            vf_range=(lo, hi),
            start_index=args.start_index,
            verbose=True,
        )
    else:
        samples = generate_dataset(
            args.n_samples,
            out_dir=None if args.start_index else args.out,
            nels_per_side=args.nels_per_side,
            seed=args.seed,
            n_iter=args.n_iter,
            families=tuple(args.families.split(",")),
            vf_range=(lo, hi),
        )
        if args.start_index:
            out = Path(args.out)
            out.mkdir(parents=True, exist_ok=True)
            for i, s in enumerate(samples):
                import numpy as np

                np.save(out / f"{args.start_index + i}.npy", s)
    print(f"Generated {len(samples)} mechanics samples in {time.time()-t0:.1f}s -> {args.out}")


if __name__ == "__main__":
    main()
