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
    args = ap.parse_args()

    t0 = time.time()
    samples = generate_dataset(
        args.n_samples, out_dir=args.out, nels_per_side=args.nels_per_side, seed=args.seed
    )
    print(f"Generated {len(samples)} mechanics samples in {time.time()-t0:.1f}s -> {args.out}")


if __name__ == "__main__":
    main()
