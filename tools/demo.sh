#!/usr/bin/env bash
# Quickstart: build a synthetic 30-class dataset and train the Adaptive
# game at the reference README's canonical configuration, then evaluate
# and extract the learned binary messages. Runs anywhere JAX runs (CPU or
# TPU). ~10 min on one TPU v5e to >0.9 dev top-6.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/mmgame_demo}"
mkdir -p "$WORK/logs"
cd "$WORK"

# glove_extra_vocab pads the GloVe file to the real glove.6B's ~400k-line
# vocabulary scale, so the demo's embed() scan runs at full size.
python -c "
import sys; sys.path.insert(0, '$REPO')
from multimodalgame_tpu.data.synthetic import build_synthetic_dataset
print(build_synthetic_dataset('.', num_classes=30, train_per_class=100,
                              dev_per_class=20, wv_dim=100,
                              glove_extra_vocab=400_000))"

PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" python -m multimodalgame_tpu \
  -experiment_name demo -model_type Adaptive \
  -max_exchange 10 -batch_size 64 -batch_size_dev 100 \
  -rec_w_dim 32 -sender_out_dim 32 -img_h_dim 256 -rec_hidden 64 \
  -learning_rate 1e-4 -entropy_rec 0.01 -entropy_sen 0.01 -entropy_s 0.08 \
  -use_binary -max_epoch 30 -top_k_dev 6 -top_k_train 6 \
  -descr_train ./descriptions.csv -descr_dev ./descriptions.csv \
  -train_file ./train.hdf5 -dev_file ./dev.hdf5 \
  -wv_dim 100 -glove_path ./glove.txt \
  -log_interval 100 -log_dev 200 -save_after 100 -save_interval 200 \
  -exchange_samples 3

PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" python -m multimodalgame_tpu \
  -log_load ./logs/demo.json -eval_only -checkpoint ./logs/demo.pt_best

PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" python -m multimodalgame_tpu \
  -log_load ./logs/demo.json -binary_only -checkpoint ./logs/demo.pt_best \
  -binary_output ./logs/demo.bv.hdf5 -fixed_exchange -batch_size_dev 20

PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" python \
  "$REPO/tools/analyse_communication.py" ./logs/demo.bv.hdf5 \
  --out-dir ./analysis
echo "demo complete: logs in $WORK/logs, analysis in $WORK/analysis"
