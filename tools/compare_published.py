"""Quality anchor against the reference's PUBLISHED samples.

The reference ships its publication-epoch ground truth: 20 real 512px DCGAN
heightmap samples (/root/reference/output/test1_repeatnod_fixp2p_nobn/
dump_a_bakup_593ish/0..19.png, README.md:48-61 — grayscale replicated to
RGB, saved at ~epoch 593 of 1000).  Every quality number in this repo so
far was repo-run vs repo-run; this tool computes the one externally
anchored comparison available in-container: SWD pyramid + terrain W1 stats
between a directory of repo-generated heightmap PNGs and those published
files, at matched scale.

Honest caveats (print with any table):
  * training data differs — the reference trained on real NASA 512px crops
    (unavailable here: no egress; bundled rasters cap at 256px), the repo's
    512px runs train on synthetic terrain and the earth256* runs on real
    256px crops;
  * 20 published samples is a small set — the same-size repo subset is
    used, and a repo-vs-repo split is printed as a noise floor.

Usage:
  python tools/compare_published.py <gen_dir> [--scale 512|256]
      [--ref-dir ...] [--real-h5 data/earth256.h5] [--seed 0]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = ("/root/reference/output/test1_repeatnod_fixp2p_nobn/"
           "dump_a_bakup_593ish")


def load_gray_pngs(path, limit=None):
    """(N, H, W, 1) float32 in [0,1] from a dir of PNGs (RGB -> first
    channel; the published files replicate gray to RGB)."""
    from imageio.v3 import imread

    files = sorted(glob.glob(os.path.join(path, "*.png")),
                   key=lambda p: (len(os.path.basename(p)), p))
    if limit:
        files = files[:limit]
    if not files:
        raise SystemExit(f"no PNGs under {path}")
    imgs = []
    for f in files:
        im = imread(f)
        if im.ndim == 3:
            im = im[..., 0]
        imgs.append(im.astype(np.float32) / 255.0)
    shapes = {i.shape for i in imgs}
    if len(shapes) != 1:
        raise SystemExit(f"mixed sample shapes under {path}: {shapes}")
    return np.stack(imgs)[..., None]


def to_scale(x, size):
    import jax

    n, h, w, c = x.shape
    if h == size:
        return x
    return np.asarray(jax.image.resize(
        x, (n, size, size, c), method="bilinear"))


def metrics(a, b, seed):
    from terrain_tpu.eval.swd import swd_pyramid
    from terrain_tpu.eval.terrain import terrain_stats

    out = dict(swd_pyramid(a, b, seed=seed))
    out.update(terrain_stats(a, b, seed=seed))
    return out


def row(label, a, b, seed):
    m = metrics(a, b, seed)
    print(f"{label:38s} swd_mean={m['swd_mean']:.4f} "
          f"elev_w1={m['elev_w1']:.4f} slope_w1={m['slope_w1']:.4f} "
          f"levels=[" + ", ".join(
              f"{m[f'swd_level{i}']:.4f}"
              for i in range(sum(1 for k in m if k.startswith('swd_level')))
          ) + "]")
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gen_dir", help="dir of repo-generated heightmap PNGs")
    ap.add_argument("--ref-dir", default=REF_DIR)
    ap.add_argument("--scale", type=int, default=512,
                    help="compare at this resolution (downscales both)")
    ap.add_argument("--real-h5", default=None,
                    help="optional h5 with xt heightmaps for real-data rows")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if os.environ.get("TERRAIN_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    ref = to_scale(load_gray_pngs(args.ref_dir), args.scale)
    gen = load_gray_pngs(args.gen_dir)
    gen = to_scale(gen, args.scale)
    n = min(len(ref), len(gen))
    print(f"# repo-vs-published anchor @ {args.scale}px, n={n} per side")
    print("# caveat: training data differs (published = real NASA 512px; "
          "repo 512px = synthetic terrain, earth256* = real 256px crops)")
    row("published-ref vs repo-gen", ref[:n], gen[:n], args.seed)
    # noise floors: split each set against itself (half vs half)
    h = max(2, n // 2)
    if len(gen) >= 2 * h:
        row("repo-gen split (noise floor)", gen[:h], gen[h:2 * h], args.seed)
    row("published split (noise floor)", ref[:10], ref[10:20], args.seed)
    if args.real_h5:
        import h5py

        with h5py.File(args.real_h5, "r") as f:
            xt = f["xt"][:2 * n].astype(np.float32) / 255.0
        if xt.ndim == 3:
            xt = xt[..., None]
        elif xt.shape[-1] != 1:
            xt = xt[..., :1]
        xt = to_scale(xt, args.scale)
        row("published-ref vs real-data crops", ref[:n], xt[:n], args.seed)
        row("repo-gen vs real-data crops", gen[:n], xt[:n], args.seed)


if __name__ == "__main__":
    main()
