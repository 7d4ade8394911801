#!/usr/bin/env bash
# One-command real-data accuracy-parity runbook (VERDICT round-3 #10).
#
# Everything in this framework is validated on class-conditional
# synthetic features because this environment has no network egress
# (PARITY.md "real-data caveat"). The day egress (or pre-fetched
# artifacts) exists, THIS script is the whole remaining distance to the
# reference's headline claim — download, validate the pretrained
# extractor, build the real datasets, train the canonical Adaptive game,
# and evaluate dev top-k:
#
#     RESNET_WEIGHTS=resnet34-b627a593.pth \
#     GLOVE_TXT=glove.6B.100d.txt \
#     bash tools/real_data_runbook.sh /data/mmgame
#
# Inputs (fetch once; URLs in comments):
#   RESNET_WEIGHTS  torchvision resnet34 state dict
#                   (https://download.pytorch.org/models/resnet34-b627a593.pth)
#   GLOVE_TXT       GloVe 6B 100-d text file
#                   (http://nlp.stanford.edu/data/glove.6B.zip)
#   fall11_urls.txt fetched by tools/build_datasets.sh itself.
#
# Expected numbers (reference README + paper, arXiv:1705.10369): the
# canonical 30-class ImageNet game reaches >= 0.95 dev top-6 accuracy
# within 500 epochs (chance 0.2); the same config on synthetic features
# reaches 1.0 (tools/demo.sh) — if stage 5 prints a top-6 accuracy in
# that band, accuracy parity is closed.

set -euo pipefail
ROOT="${1:?usage: real_data_runbook.sh <workdir>}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$ROOT"

echo "== [1/5] Validate the pretrained ResNet-34 extractor =="
# Max |diff| per tap between our functional NHWC ResNet and the
# reference's torchvision graph at the loaded weights; PASS < 1e-3.
python "$REPO/tools/validate_resnet.py" --pth "${RESNET_WEIGHTS:?set RESNET_WEIGHTS}"

echo "== [2/5] Build the 30-class datasets (download + features) =="
# URL dump -> class lists/splits/descriptions -> image download ->
# ResNet-34 feature HDF5s (train/dev/test), reference schema.
(cd "$REPO/tools" && RESNET_WEIGHTS="$RESNET_WEIGHTS" bash build_datasets.sh)
for f in train dev test descriptions.csv; do
    mv "$REPO/tools/${f%.csv}"*.hdf5 "$ROOT/" 2>/dev/null || true
    [ -e "$REPO/tools/$f" ] && mv "$REPO/tools/$f" "$ROOT/" || true
done

echo "== [3/5] Train the canonical Adaptive game (500 epochs) =="
COMMON=(
    -model_type Adaptive
    -train_file "$ROOT/train.hdf5" -dev_file "$ROOT/dev.hdf5"
    -descr_train "$ROOT/descriptions.csv" -descr_dev "$ROOT/descriptions.csv"
    -wv_type glove.6B -wv_dim 100 -glove_path "${GLOVE_TXT:?set GLOVE_TXT}"
    -log_path "$ROOT/logs" -experiment_name real30
    -batch_size 64 -batch_size_dev 64 -top_k_train 6 -top_k_dev 6
    -max_epoch 500 -log_interval 50 -log_dev 1000
    -save_after 1000 -save_interval 2000
)
python -m multimodalgame_tpu "${COMMON[@]}"

echo "== [4/5] Evaluate the best checkpoint on dev =="
python -m multimodalgame_tpu "${COMMON[@]}" -eval_only \
    -checkpoint "$ROOT/logs/real30.pt_best"

echo "== [5/5] Extract + analyse the learned communication =="
python -m multimodalgame_tpu "${COMMON[@]}" -binary_only \
    -checkpoint "$ROOT/logs/real30.pt_best" -shuffle_dev \
    -batch_size_dev 50
python "$REPO/tools/analyse_communication.py" \
    "$ROOT/logs/real30.bv.hdf5" --out-dir "$ROOT/analysis"

echo "Runbook complete. Dev top-6 is in $ROOT/logs/real30.eval.csv;"
echo "compare against the >=0.95 band documented at the top of this script."
