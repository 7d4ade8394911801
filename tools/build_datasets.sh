#!/usr/bin/env bash
# Dataset build orchestration (reference utils/build_datasets.sh:1-21):
# fetch the ImageNet URL dump, derive the 30-class game's URL lists,
# splits, and descriptions, download the images, then extract ResNet-34
# features into train/dev/test HDF5 files.
#
# Requires network access and NLTK WordNet data; pass RESNET_WEIGHTS to
# use a pretrained torchvision resnet34 .pth for feature extraction.
set -euo pipefail
cd "$(dirname "$0")"

URLS_TGZ=imagenet_fall11_urls.tgz
if [ ! -f fall11_urls.txt ]; then
    wget "http://image-net.org/imagenet_data/urls/${URLS_TGZ}"
    tar -xzf "${URLS_TGZ}"
fi

python download_data.py --cmd_urls
python download_data.py --cmd_split
python download_data.py --cmd_desc
python download_data.py --cmd_download

WEIGHTS_ARG=""
if [ -n "${RESNET_WEIGHTS:-}" ]; then
    WEIGHTS_ARG="-weights ${RESNET_WEIGHTS}"
fi

for split in train dev test; do
    python package_data.py \
        -load_imgs "./imgs/${split}" \
        -save_hdf5 "${split}.hdf5" \
        -load_desc descriptions.csv \
        ${WEIGHTS_ARG}
done
