"""ImageNet URL / split / description / download pipeline (Python 3).

Parity target: reference ``utils/download_data.py`` — four subcommands
operated over the 30-animal-synset game:

* ``--cmd_urls``: filter the fall11 ImageNet URL dump down to the game's
  synsets, keep only static.flickr URLs, shuffle (seeded) and cap at
  ``class_size`` per class, write ``urls/<class>.txt``
  (reference: 138-174).
* ``--cmd_split``: shuffle each class's URLs and split into
  train/dev/test of ``train_size``/``dev_size``/``test_size``, writing a
  single ``datasets.json`` (177-209).
* ``--cmd_desc``: look up each class's animal-sense WordNet definition and
  write ``label_id,label,description`` rows, classes sorted
  alphabetically (212-233). Requires an NLTK WordNet installation.
* ``--cmd_download``: download every split's images with a bounded
  thread pool, throttled, skipping files that already exist (82-135,
  236-253); filenames derive from the flickr URL parts.

This environment has no network egress; ``--cmd_urls``/``--cmd_split``
operate on local files and run anywhere, the other two degrade with clear
errors when their external dependency (WordNet data, the network) is
unavailable.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import random
import sys
import time
import urllib.request
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor

DEFAULT_SYNSETS = (
    "n01498041,n01514859,n01518878,n01531178,n01558993,n01580077,"
    "n01582220,n01592084,n01616318,n01641577,n01667778,n01687978,"
    "n01704323,n01768244,n01770393,n01774750,n01784675,n01806143,"
    "n01806567,n01807496,n01818515,n01820546,n01833805,n01843065,"
    "n01847000,n01855672,n01910747,n01944390,n01945685,n01882714")
DEFAULT_CLASSES = (
    "stingray,hen,ostrich,goldfinch,robin,jay,magpie,chickadee,vulture,"
    "bullfrog,terrapin,agama,triceratops,trilobite,scorpion,tarantula,"
    "centipede,peacock,quail,partridge,macaw,lorikeet,hummingbird,"
    "jacamar,drake,goose,jellyfish,snail,slug,koala")

_FLICKR_RE = re.compile(
    r"https?://(?P<subdomain>.+?)\.flickr\.com/(?P<part1>.+)/"
    r"(?P<part2>[^/.]+)\.(?P<suffix>\w+)$")


def flickr_name(url: str) -> str:
    """Derive a stable local filename from a flickr URL's parts
    (reference 76-79)."""
    m = _FLICKR_RE.match(url)
    if not m:
        raise ValueError(f"not a flickr URL: {url}")
    d = m.groupdict()
    d["part1"] = d["part1"].replace("/", "_")
    return "{subdomain}_{part1}_{part2}.{suffix}".format(**d)


def cmd_urls(args) -> None:
    random.seed(args.seed)
    os.makedirs(args.save_urls_path, exist_ok=True)
    synsets = args.synsets.split(",")
    classes = args.classes.split(",")
    synset_to_class = dict(zip(synsets, classes))
    urls: "OrderedDict[str, list]" = OrderedDict((c, []) for c in classes)

    with open(args.load_imagenet_path, errors="replace") as f:
        for ii, line in enumerate(f):
            try:
                synset, url = line.strip().split("\t")
                synset = synset.split("_")[0]
            except ValueError:
                print(f"skipping line {ii}", file=sys.stderr)
                continue
            if synset in synset_to_class and args.filter_url in url:
                urls[synset_to_class[synset]].append(url)

    for cls, cls_urls in urls.items():
        random.shuffle(cls_urls)
        kept = cls_urls[:args.class_size]
        assert len(kept) == args.class_size, \
            f"Not enough urls for: {cls} ({len(kept)})"
        with open(os.path.join(args.save_urls_path, cls + ".txt"),
                  "w") as f:
            f.write("\n".join(kept) + "\n")


def cmd_split(args) -> None:
    random.seed(args.seed)
    datasets = {"train": {}, "dev": {}, "test": {}}
    need = args.train_size + args.dev_size + args.test_size
    for cls in args.classes.split(","):
        with open(os.path.join(args.load_urls_path, cls + ".txt")) as f:
            urls = [line.strip() for line in f if line.strip()]
        assert len(urls) >= need, \
            f"There are not sufficient urls for class: {cls}"
        random.shuffle(urls)
        datasets["train"][cls] = urls[:args.train_size]
        off = args.train_size
        datasets["dev"][cls] = urls[off:off + args.dev_size]
        off += args.dev_size
        datasets["test"][cls] = urls[off:off + args.test_size]
    with open(args.save_datasets_path, "w") as f:
        f.write(json.dumps(datasets, indent=4, sort_keys=True))


def cmd_desc(args) -> None:
    try:
        from nltk.corpus import wordnet as wn
        animal = wn.synset("animal.n.01")
    except Exception as e:
        raise SystemExit(
            "cmd_desc requires NLTK WordNet data (python -m nltk.downloader"
            " wordnet); not available in this environment: %s" % e)

    descriptions = OrderedDict()
    for cls in args.classes.split(","):
        chosen = None
        for i in range(1, 10):
            # The reference lets wn.synset raise once the senses run out
            # (utils/download_data.py:219-225), which aborts with an
            # obscure WordNetError before its own "no animal synset"
            # check can fire — treat exhausted senses (and non-animal
            # LCH results) as "keep looking" so the clear error below is
            # actually reachable.
            try:
                syn = wn.synset(f"{cls}.n.0{i}")
                lch = syn.lowest_common_hypernyms(animal)
            except Exception:
                break
            if lch and lch[0] == animal:
                chosen = syn
                break
        if chosen is None:
            raise RuntimeError(f"No animal synset found for: {cls}")
        descriptions[cls] = chosen.definition()

    with open(args.save_descriptions_path, "w") as f:
        for ii, cls in enumerate(sorted(descriptions)):
            f.write("{},{},{}\n".format(
                ii, cls, descriptions[cls].replace(",", "")))


def _download_one(url: str, save_dir: str, throttle: float) -> None:
    path = os.path.join(save_dir, flickr_name(url))
    if os.path.exists(path):
        return
    # Fetch to a temp name and rename on success: a mid-transfer failure
    # must not leave a truncated file that the exists() check above would
    # treat as complete on every retry.
    tmp = path + ".part"
    try:
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    time.sleep(throttle)


def cmd_download(args) -> None:
    with open(args.load_datasets_path) as f:
        datasets = json.load(f)
    for split in ("train", "dev", "test"):
        split_dir = os.path.join(args.save_images, split)
        os.makedirs(split_dir, exist_ok=True)
        for cls in args.classes.split(","):
            cls_dir = os.path.join(split_dir, cls)
            os.makedirs(cls_dir, exist_ok=True)
            urls = datasets[split][cls]
            print(f"Downloading images for {split}/{cls} "
                  f"({len(urls)} urls)")
            with ThreadPoolExecutor(args.num_threads) as pool:
                futures = [pool.submit(_download_one, u, cls_dir,
                                       args.throttle) for u in urls]
                for fut in futures:
                    try:
                        fut.result()
                    except Exception as e:
                        print(f"  failed: {e}", file=sys.stderr)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--synsets", default=DEFAULT_SYNSETS)
    p.add_argument("--classes", default=DEFAULT_CLASSES)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--load_imagenet_path", default="./fall11_urls.txt")
    p.add_argument("--save_urls_path", default="./urls")
    p.add_argument("--class_size", type=int, default=500)
    p.add_argument("--filter_url", default="static.flickr")
    p.add_argument("--load_urls_path", default="./urls")
    p.add_argument("--save_datasets_path", default="datasets.json")
    p.add_argument("--train_size", type=int, default=100)
    p.add_argument("--dev_size", type=int, default=100)
    p.add_argument("--test_size", type=int, default=100)
    p.add_argument("--load_datasets_path", default="datasets.json")
    p.add_argument("--save_images", default="./imgs")
    p.add_argument("--save_descriptions_path", default="./descriptions.csv")
    p.add_argument("--num_threads", type=int, default=8)
    p.add_argument("--throttle", type=float, default=0.01)
    p.add_argument("--cmd_urls", action="store_true")
    p.add_argument("--cmd_split", action="store_true")
    p.add_argument("--cmd_desc", action="store_true")
    p.add_argument("--cmd_download", action="store_true")
    args = p.parse_args(argv)

    print("Flag Values:\n" + json.dumps(vars(args), indent=4,
                                        sort_keys=True))
    if args.cmd_urls:
        cmd_urls(args)
    if args.cmd_split:
        cmd_split(args)
    if args.cmd_desc:
        cmd_desc(args)
    if args.cmd_download:
        cmd_download(args)


if __name__ == "__main__":
    main()
