"""Tile the first k*k generated samples into one contact sheet.

Replaces the inline heredoc from scripts/chip_chain_r4b.sh so the step is
reusable and resumable (the reference's analog is the manual montage behind
README.md:48-61's published sample grid).

Usage: python tools/make_gen_sheet.py <gen_dir> <out.png> [--k 5]
"""

import argparse
import glob
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gen_dir")
    ap.add_argument("out")
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    from imageio.v3 import imread, imwrite

    files = sorted(glob.glob(os.path.join(args.gen_dir, "*.png")))
    files = files[: args.k * args.k]
    if not files:
        raise SystemExit(f"no PNGs under {args.gen_dir}")
    imgs = [imread(f) for f in files]
    for f, im in zip(files, imgs):
        if im.shape != imgs[0].shape:
            raise SystemExit(
                f"{f}: shape {im.shape} != first tile's {imgs[0].shape} "
                f"({files[0]}) — mixed-size/channel gen dir")
    h, w = imgs[0].shape[:2]
    sheet = np.zeros((args.k * h, args.k * w) + imgs[0].shape[2:],
                     imgs[0].dtype)
    for i, im in enumerate(imgs):
        r, c = divmod(i, args.k)
        sheet[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
    imwrite(args.out, sheet)
    print(f"gen sheet: {len(imgs)} tiles -> {args.out}")


if __name__ == "__main__":
    main()
