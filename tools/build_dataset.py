"""Offline dataset builder (script form of the reference's
notebooks/prototype_cropping_code.ipynb).

Pipeline (notebook cells 11-19, 27-48):
  1. load the NASA Visible Earth raster pair — gebco_08_rev_elev heightmap
     PNG + world.200412 texture JPG, both 21600x10800 (README.md:24-26);
     this container has no egress, so the rasters must already be on disk;
  2. slide a crop_size window (512) at `stride` (100) over both rasters,
     discarding crops whose heightmap is >90% zeros (ocean) — the
     `comparator` of cell 11;
  3. shuffle and write a 90/10 train/valid split to h5 as uint8 NHWC
     xt/yt/xv/yv (cells 17-19, 27);
  4. optional color subsetting (cells 38-48): rank crops by mean-RGB MSE
     against a reference image and keep the top-k ("green500" /
     "brown500"); `--subset-valid-split` reproduces brown500_with_valid,
     while the default reproduces brown500's xv==xt quirk (cell 43).

Usage:
  python tools/build_dataset.py --heightmap elev.png --texture tex.jpg \
      --out textures_v2.h5 [--crop 512 --stride 100]
  python tools/build_dataset.py --subset-from textures_v2.h5 \
      --ref-img brown_ref.png --top-k 240 --out textures_v2_brown500.h5
"""

import argparse
import os

import numpy as np


def comparator(heightmap_chunk):
    """Keep a crop unless >90% of its heightmap is zero (ocean), cell 11."""
    frac_black = float((heightmap_chunk == 0).sum()) / heightmap_chunk.size
    return frac_black <= 0.9


def get_chunks(texture, heightmap, crop_size=512, stride=100, max_n=None):
    """Yield (texture_crop (s,s,3), heightmap_crop (s,s,1)) pairs, cell 12."""
    assert texture.shape[:2] == heightmap.shape[:2]
    ctr = 0
    for y in range(0, texture.shape[0], stride):
        for x in range(0, texture.shape[1], stride):
            tex = texture[y:y + crop_size, x:x + crop_size]
            hm = heightmap[y:y + crop_size, x:x + crop_size]
            if tex.shape != (crop_size, crop_size, 3):
                continue
            if hm.ndim == 2:
                hm = hm[:, :, None]
            if not comparator(hm):
                continue
            yield tex, hm
            ctr += 1
            if max_n is not None and ctr == max_n:
                return


def build(heightmap_path, texture_path, out_path, crop_size=512, stride=100,
          max_n=None, seed=42):
    import h5py
    import imageio.v3 as iio

    texture = np.asarray(iio.imread(texture_path))[..., :3]
    heightmap = np.asarray(iio.imread(heightmap_path))
    if heightmap.ndim == 3:
        heightmap = heightmap[..., 0]
    crops = list(get_chunks(texture, heightmap, crop_size, stride, max_n))
    n = len(crops)
    print(f"number of patches detected: {n}")
    rnd = np.random.RandomState(seed)
    idxs = rnd.permutation(n)
    n_train = int(n * 0.9)
    out_dir = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(out_dir, exist_ok=True)
    with h5py.File(out_path, "w") as f:
        f.create_dataset("xt", (n_train, crop_size, crop_size, 1), dtype="uint8")
        f.create_dataset("yt", (n_train, crop_size, crop_size, 3), dtype="uint8")
        f.create_dataset("xv", (n - n_train, crop_size, crop_size, 1), dtype="uint8")
        f.create_dataset("yv", (n - n_train, crop_size, crop_size, 3), dtype="uint8")
        for j, i in enumerate(idxs):
            tex, hm = crops[i]
            if j < n_train:
                f["xt"][j], f["yt"][j] = hm, tex
            else:
                f["xv"][j - n_train], f["yv"][j - n_train] = hm, tex
    print(f"wrote {out_path}: {n_train} train / {n - n_train} valid")


def get_idxs_close_to_img(some_img, textures):
    """Rank dataset crops by mean-RGB MSE vs a reference image (cell 38)."""
    ref_rgb = np.mean(np.asarray(some_img, np.float64), axis=(0, 1), keepdims=True)
    dists = [
        float(np.sum((ref_rgb - np.mean(np.asarray(textures[i], np.float64),
                                        axis=(0, 1), keepdims=True)) ** 2))
        for i in range(textures.shape[0])
    ]
    return dists, np.argsort(dists)


def build_subset(src_path, ref_img_path, out_path, top_k=240,
                 valid_split=False, seed=42):
    """Color-similarity subset (cells 39-48).  Default reproduces
    brown500's xv==xt quirk; valid_split makes a real 90/10 split."""
    import h5py
    import imageio.v3 as iio

    ref = np.asarray(iio.imread(ref_img_path))[..., :3]
    with h5py.File(src_path, "r") as g:
        # rank by the train textures (the notebook ranked the full db)
        _, order = get_idxs_close_to_img(ref, g["yt"])
        chosen = sorted(order[:top_k].tolist())
        xt = g["xt"][chosen]
        yt = g["yt"][chosen]
    s = xt.shape[1]
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with h5py.File(out_path, "w") as f:
        if valid_split:
            rnd = np.random.RandomState(seed)
            perm = rnd.permutation(top_k)
            n_train = int(0.9 * top_k)
            tr, va = perm[:n_train], perm[n_train:]
            f.create_dataset("xt", data=xt[sorted(tr.tolist())])
            f.create_dataset("yt", data=yt[sorted(tr.tolist())])
            f.create_dataset("xv", data=xt[sorted(va.tolist())])
            f.create_dataset("yv", data=yt[sorted(va.tolist())])
        else:
            f.create_dataset("xt", data=xt)
            f.create_dataset("yt", data=yt)
            f.create_dataset("xv", data=xt)  # xv == xt, cell 43 quirk
            f.create_dataset("yv", data=yt)
    print(f"wrote {out_path}: top-{top_k} subset (valid_split={valid_split})")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--heightmap")
    ap.add_argument("--texture")
    ap.add_argument("--out", required=True)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--stride", type=int, default=100)
    ap.add_argument("--max-n", type=int, default=None)
    ap.add_argument("--subset-from")
    ap.add_argument("--ref-img")
    ap.add_argument("--top-k", type=int, default=240)
    ap.add_argument("--subset-valid-split", action="store_true")
    args = ap.parse_args()
    if args.subset_from:
        build_subset(args.subset_from, args.ref_img, args.out, args.top_k,
                     args.subset_valid_split)
    else:
        build(args.heightmap, args.texture, args.out, args.crop, args.stride,
              args.max_n)


if __name__ == "__main__":
    main()
