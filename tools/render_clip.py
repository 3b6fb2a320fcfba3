"""Assemble interpolation frames into an animated GIF/MP4.

The reference dumped per-frame PNGs (generate_interpolation_clip,
pix2pix.py:374-425) and assembled video externally; this packages the step:

  python tools/render_clip.py output/<name>/interp_clip clip.gif --fps 25
"""

import argparse
import glob
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("frames_dir")
    ap.add_argument("out", help=".gif or .mp4 (mp4 needs ffmpeg present)")
    ap.add_argument("--fps", type=int, default=25)
    ap.add_argument("--pattern", default="concat_*.png")
    args = ap.parse_args()
    import imageio.v3 as iio

    files = sorted(glob.glob(os.path.join(args.frames_dir, args.pattern)))
    if not files:
        raise SystemExit(f"no frames matching {args.pattern} in {args.frames_dir}")
    frames = []
    skipped = 0
    for f in files:
        try:
            frames.append(iio.imread(f))
        except Exception:  # truncated frame from an interrupted run
            skipped += 1
    if skipped:
        print(f"skipped {skipped} unreadable frame(s)")
    if not frames:
        raise SystemExit("no readable frames")
    if args.out.endswith(".gif"):
        iio.imwrite(args.out, frames, duration=1000 // args.fps, loop=0)
    else:
        iio.imwrite(args.out, frames, fps=args.fps)
    print(f"wrote {args.out} ({len(frames)} frames @ {args.fps} fps)")


if __name__ == "__main__":
    main()
