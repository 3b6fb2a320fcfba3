"""Assemble a filmstrip PNG from interpolation-clip frames.

The reference's publication artifact is a video assembled externally from
generate_interpolation_clip's per-frame PNGs (pix2pix.py:374-425); for the
committed evidence we keep a k-frame strip (evenly spaced) instead of 2475
frames.

Usage: python tools/make_filmstrip.py <frames_dir> <out.png> [--k 8]
       [--pattern "concat_*.png"]
"""

import argparse
import glob
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("frames_dir")
    ap.add_argument("out")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--pattern", default="concat_*.png")
    args = ap.parse_args()
    import numpy as np
    from imageio.v3 import imread, imwrite

    files = sorted(glob.glob(os.path.join(args.frames_dir, args.pattern)))
    if not files:
        raise SystemExit(f"no frames matching {args.pattern} in "
                         f"{args.frames_dir}")
    k = min(args.k, len(files))
    picks = [files[round(i * (len(files) - 1) / max(k - 1, 1))]
             for i in range(k)]
    imgs = []
    for f in picks:
        try:
            imgs.append(imread(f))
        except Exception:  # truncated frame from an interrupted run
            pass
    if not imgs:
        raise SystemExit("no readable frames")
    strip = np.concatenate(imgs, axis=1)
    imwrite(args.out, strip)
    print(f"filmstrip: {len(imgs)} of {len(files)} frames -> {args.out}")


if __name__ == "__main__":
    main()
