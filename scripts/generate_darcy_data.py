"""CLI for the Darcy ground-truth generator (reference:
`darcy_data_generation.py:167-236`).

    python scripts/generate_darcy_data.py --n-samples 64 --out ./data/darcy/train --workers 8
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from physicsinformeddiffusionmodels_tpu.data.darcy_generator import generate_dataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-samples", type=int, default=10)
    ap.add_argument("--pixels-per-dim", type=int, default=64)
    ap.add_argument("--out", default="./data/darcy/train")
    ap.add_argument("--workers", type=int, default=1)
    ap.add_argument("--seed", type=int, default=None, help="base seed (default: process-unique)")
    ap.add_argument("--q", type=int, default=64)
    args = ap.parse_args()

    t0 = time.time()
    K, p, res, seeds = generate_dataset(
        args.n_samples,
        pixels_per_dim=args.pixels_per_dim,
        out_dir=args.out,
        num_workers=args.workers,
        q=args.q,
        base_seed=args.seed,
    )
    print(f"Generated {len(K)} samples in {time.time()-t0:.1f}s -> {args.out}")
    print(f"mean lstsq residual: {res.mean():.2e}  max: {res.max():.2e}")


if __name__ == "__main__":
    main()
