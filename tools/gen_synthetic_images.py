"""Generate class-conditional synthetic JPEG images for the zero-network
full-chain demo (tools/demo_full_chain.sh).

The reference pipeline starts from Flickr JPEGs fetched by
utils/download_data.py (no egress here), laid out for torchvision's
ImageFolder (utils/package_data.py:181-196): ``<root>/<class>/<name>.jpg``.
This tool fabricates that layout locally: each class gets a distinct
procedural pattern (class-seeded base color + stripe geometry) plus
per-image noise, so downstream ResNet features — even at random weights —
carry class information and the game has something to learn.

Usage:
  python tools/gen_synthetic_images.py --desc descriptions.csv \
      --out imgs/train --per-class 100 [--size 64] [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def class_image(rng: np.ndarray, cls_idx: int, size: int) -> np.ndarray:
    """One (size, size, 3) uint8 image: class-determined base color and
    stripe pattern, image-determined noise."""
    crng = np.random.RandomState(1000 + cls_idx)
    base = crng.randint(40, 216, size=3)
    period = int(crng.randint(4, 12))
    angle = crng.rand() * np.pi

    yy, xx = np.mgrid[0:size, 0:size]
    proj = xx * np.cos(angle) + yy * np.sin(angle)
    stripes = ((proj // period) % 2).astype(np.float32)

    img = np.empty((size, size, 3), np.float32)
    alt = (base + crng.randint(-60, 61, size=3)).clip(0, 255)
    for c in range(3):
        img[:, :, c] = base[c] * stripes + alt[c] * (1 - stripes)
    img += rng.randn(size, size, 3) * 12.0
    return img.clip(0, 255).astype(np.uint8)


def generate(desc_path: str, out_root: str, per_class: int, size: int,
             seed: int, quality: int = 90) -> int:
    from PIL import Image

    classes = []
    with open(desc_path) as f:
        for line in f:
            _, label, _ = line.strip().split(",", 2)
            classes.append(label)

    rng = np.random.RandomState(seed)
    count = 0
    for ci, cls in enumerate(classes):
        cls_dir = os.path.join(out_root, cls)
        os.makedirs(cls_dir, exist_ok=True)
        for i in range(per_class):
            img = class_image(rng, ci, size)
            Image.fromarray(img).save(
                os.path.join(cls_dir, "img_%05d.jpg" % i),
                quality=quality)
            count += 1
    return count


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--desc", required=True,
                   help="descriptions CSV (label_id,label,description)")
    p.add_argument("--out", required=True, help="output ImageFolder root")
    p.add_argument("--per-class", type=int, default=100)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    n = generate(args.desc, args.out, args.per_class, args.size, args.seed)
    print(f"wrote {n} JPEGs under {args.out}")


if __name__ == "__main__":
    main()
