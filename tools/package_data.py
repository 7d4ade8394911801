"""Dataset build: images -> ResNet-34 features -> HDF5.

Parity target: reference ``utils/package_data.py`` — walk an
ImageFolder-style directory (``root/<class>/<image>``), preprocess
(resize shorter side to 227, center-crop 227, normalize to (.5, .5);
utils/package_data.py:171-178), run ResNet-34 collecting the requested
taps (default ``layer4_2,avgpool_512,fc``), skip unreadable images
(utils/package_data.py:198-208), and write an HDF5 file with datasets
``Target``, ``Location``, and one ``(N, 1, ...)``-shaped dataset per
requested feature (utils/package_data.py:238-243).

TPU-first: inference is one jitted ``resnet34_features`` call per batch
(XLA convolutions on the MXU) with a fixed batch shape (the final ragged
batch is padded and trimmed) so a single compiled program serves the whole
run. PIL replaces the torchvision transform stack (torchvision is not
installed here).

Usage:
    python tools/package_data.py -load_imgs ./imgs/train \
        -save_hdf5 train.hdf5 -load_desc descriptions.csv \
        [-weights resnet34.pth] [-batch_size 32]

Without ``-weights`` a deterministic random-weight network is used (this
environment cannot download the pretrained file); features are still
valid for pipeline testing, and real deployments pass the torchvision
``resnet34`` .pth.
"""

from __future__ import annotations

import argparse
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def preprocess_image(path: str) -> np.ndarray:
    """PIL equivalent of Scale(227) + CenterCrop(227) + ToTensor +
    Normalize((.5,.5,.5), (.5,.5,.5)) -> (3, 227, 227) float32."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    w, h = img.size
    # torchvision Scale: shorter side -> 227, keep aspect.
    if w < h:
        nw, nh = 227, max(227, int(round(h * 227 / w)))
    else:
        nw, nh = max(227, int(round(w * 227 / h))), 227
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - 227) // 2
    top = (nh - 227) // 2
    img = img.crop((left, top, left + 227, top + 227))
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return np.transpose(arr, (2, 0, 1))


def label_mapping(desc_path: str) -> dict:
    """label -> label_id from the descriptions CSV
    (utils/package_data.py:134-141)."""
    label_to_id = {}
    with open(desc_path) as f:
        for line in f:
            label_id, label, _ = line.strip().split(",", 2)
            label_to_id[label] = int(label_id)
    return label_to_id


def iter_image_paths(root: str):
    """ImageFolder order: classes sorted, files sorted within class."""
    for cls in sorted(os.listdir(root)):
        cls_dir = os.path.join(root, cls)
        if not os.path.isdir(cls_dir):
            continue
        for name in sorted(os.listdir(cls_dir)):
            yield cls, os.path.join(cls_dir, name)


def run(args) -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: opt-in only via JAX_COMPILATION_CACHE_DIR
    # (reloading XLA:CPU AOT entries aborts on some hosts — see
    # utils/compile_cache.py).
    from multimodalgame_tpu.utils import compile_cache
    compile_cache.configure(jax, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from multimodalgame_tpu.models.resnet import (load_pretrained,
                                                  random_params,
                                                  resnet34_features)

    request = args.request.split(",")
    if args.weights:
        params = load_pretrained(args.weights)
    else:
        print("WARNING: no -weights given; using deterministic random "
              "ResNet-34 weights (pipeline-testing mode)", file=sys.stderr)
        params = random_params(0)

    fwd = jax.jit(lambda x: resnet34_features(params, x, tuple(request)))

    label_to_id = label_mapping(args.load_desc)

    targets, locations = [], []
    feats = {r: [] for r in request}
    batch_imgs, batch_meta = [], []

    def flush():
        if not batch_imgs:
            return
        n = len(batch_imgs)
        x = np.stack(batch_imgs, 0)
        if n < args.batch_size:  # pad to the compiled batch shape
            x = np.concatenate(
                [x, np.zeros((args.batch_size - n,) + x.shape[1:],
                             np.float32)], 0)
        out = fwd(jnp.asarray(x))
        for r in request:
            feats[r].append(np.asarray(out[r])[:n])
        for cls, loc in batch_meta:
            targets.append(label_to_id[cls])
            locations.append(loc)
        batch_imgs.clear()
        batch_meta.clear()

    skipped = 0
    for cls, path in iter_image_paths(args.load_imgs):
        try:
            img = preprocess_image(path)
        except Exception:
            skipped += 1  # unreadable images are skipped
            continue     # (utils/package_data.py:198-208)
        batch_imgs.append(img)
        batch_meta.append((cls, os.path.basename(path)))
        if len(batch_imgs) == args.batch_size:
            flush()
    flush()
    if skipped:
        print(f"skipped {skipped} unreadable images", file=sys.stderr)

    with h5py.File(args.save_hdf5, "w") as f:
        f.create_dataset("Target", data=np.asarray(targets, np.int64))
        f.create_dataset("Location",
                         data=np.asarray(locations, dtype="S50"))
        for r in request:
            data = np.concatenate(feats[r], 0)
            # Reference schema stores a singleton axis after batch
            # (utils/package_data.py:144-155).
            f.create_dataset(r, data=data[:, None])
    print(f"wrote {len(targets)} examples to {args.save_hdf5}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-load_desc", "--load_desc", default="descriptions.csv")
    p.add_argument("-load_imgs", "--load_imgs", default="./imgs/train")
    p.add_argument("-save_hdf5", "--save_hdf5", default="train.hdf5")
    p.add_argument("-batch_size", "--batch_size", type=int, default=32)
    p.add_argument("-request", "--request",
                   default="layer4_2,avgpool_512,fc")
    p.add_argument("-weights", "--weights", default=None,
                   help="path to a torchvision resnet34 state_dict .pth")
    run(p.parse_args(argv))


if __name__ == "__main__":
    main()
