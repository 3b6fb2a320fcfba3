"""Write a synthetic reference-layout dataset for smoke runs / benchmarks.

Usage: python tools/make_synthetic.py out.h5 [--n 240] [--size 512]
"""

import argparse

from terrain_tpu.data.synthetic import write_h5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--n-valid", type=int, default=24)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    write_h5(args.out, n_train=args.n, n_valid=args.n_valid, size=args.size,
             seed=args.seed)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
