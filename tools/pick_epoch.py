"""Print the quality-best checkpoint for a run (swd.txt-driven).

The reference's publication used its best epoch, not the last one
(/root/reference/README.md:48-61 ships ~e593 of 1000 —
dump_a_bakup_593ish/); our 512px trajectories show the same late SWD
drift (docs/RESULTS_r4.md section 2b).  This is the scriptable face of
terrain_tpu.train.checkpoint.pick_best_epoch — the gen/interp CLI modes
use the same picker by default (TERRAIN_PICK=swd, experiments.py).

Usage: python tools/pick_epoch.py <out_dir> <model_dir> [--metric swd_mean]
Prints the checkpoint path on stdout (details on stderr); exits 1 if the
run has no usable swd.txt or checkpoints.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", help="run output dir (holds swd.txt)")
    ap.add_argument("model_dir", help="run model dir (holds <epoch>.model)")
    ap.add_argument("--metric", default="swd_mean",
                    choices=("swd_mean", "p2p_swd_mean", "both"))
    args = ap.parse_args()

    from terrain_tpu.train.checkpoint import pick_best_epoch

    pick = pick_best_epoch(args.out_dir, args.model_dir, metric=args.metric)
    if pick is None:
        print(f"no usable swd.txt/checkpoints under {args.out_dir} / "
              f"{args.model_dir}", file=sys.stderr)
        return 1
    path, ckpt_epoch, best_epoch, value = pick
    print(f"{args.metric} best @e{best_epoch} = {value:.4f} -> "
          f"checkpoint e{ckpt_epoch}", file=sys.stderr)
    print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
