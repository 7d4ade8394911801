#!/usr/bin/env bash
# Full L0->L7 chain with ZERO network (VERDICT round-2 #7): synthetic
# JPEGs -> ResNet-34 feature packaging (tools/package_data.py, random
# weights unless RESNET_WEIGHTS is set to a torchvision .pth) -> chunked
# training -> dev evaluation -> binary-message extraction -> offline
# analysis — the entire reference surface (utils/build_datasets.sh +
# model.py run()/eval/extract + analyse_communication) end to end.
# Schema assertions pin the packaged HDF5 to utils/package_data.py:238-243
# and the extraction file to binary_vectors.py:24-46.
#
# Usage: bash tools/demo_full_chain.sh [WORKDIR] [MAX_EPOCH] [PER_CLASS]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/mmgame_full_chain}"
MAX_EPOCH="${2:-30}"
PER_CLASS="${3:-100}"
PY() { PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" python "$@"; }
mkdir -p "$WORK/logs"
cd "$WORK"
cp "$REPO/data/descriptions.csv" .

# L0a: fabricate the ImageFolder layout the downloader would produce.
PY "$REPO/tools/gen_synthetic_images.py" --desc descriptions.csv \
   --out imgs/train --per-class "$PER_CLASS" --seed 0
PY "$REPO/tools/gen_synthetic_images.py" --desc descriptions.csv \
   --out imgs/dev --per-class "$((PER_CLASS / 5))" --seed 1

# L0b: JPEGs -> jitted ResNet-34 -> feature HDF5 (reference schema).
WEIGHTS_ARGS=()
if [[ -n "${RESNET_WEIGHTS:-}" ]]; then
  WEIGHTS_ARGS=(-weights "$RESNET_WEIGHTS")
fi
PY "$REPO/tools/package_data.py" -load_desc descriptions.csv \
   -load_imgs imgs/train -save_hdf5 train.hdf5 -batch_size 32 \
   "${WEIGHTS_ARGS[@]}"
PY "$REPO/tools/package_data.py" -load_desc descriptions.csv \
   -load_imgs imgs/dev -save_hdf5 dev.hdf5 -batch_size 32 \
   "${WEIGHTS_ARGS[@]}"

# Schema pin: utils/package_data.py:238-243.
PY - <<'EOF'
import h5py, numpy as np
for path in ("train.hdf5", "dev.hdf5"):
    with h5py.File(path) as f:
        assert f["Target"].dtype == np.int64, f["Target"].dtype
        assert f["Location"].dtype == np.dtype("S50")
        feat = f["avgpool_512"]
        n = f["Target"].shape[0]
        assert feat.shape[0] == n and feat.shape[1] == 1, feat.shape
print("packaged HDF5 schema ok (Target/Location/avgpool_512[:,None])")
EOF

# L1-L6: train the canonical Adaptive game on the packaged features.
PY -m multimodalgame_tpu \
  -experiment_name chain -model_type Adaptive \
  -max_exchange 10 -batch_size 64 -batch_size_dev 100 \
  -rec_w_dim 32 -sender_out_dim 32 -img_h_dim 256 -rec_hidden 64 \
  -learning_rate 1e-4 -entropy_rec 0.01 -entropy_sen 0.01 -entropy_s 0.08 \
  -use_binary -max_epoch "$MAX_EPOCH" -top_k_dev 6 -top_k_train 6 \
  -descr_train ./descriptions.csv -descr_dev ./descriptions.csv \
  -train_file ./train.hdf5 -dev_file ./dev.hdf5 \
  -wv_type fake -wv_dim 100 \
  -log_interval 100 -log_dev 200 -save_after 0 -save_interval 200 \
  -exchange_samples 3

PY -m multimodalgame_tpu \
  -log_load ./logs/chain.json -eval_only -checkpoint ./logs/chain.pt_best

PY -m multimodalgame_tpu \
  -log_load ./logs/chain.json -binary_only -checkpoint ./logs/chain.pt_best \
  -binary_output ./logs/chain.bv.hdf5 -fixed_exchange \
  -batch_size_dev "$((PER_CLASS / 5))"

# Schema pin: binary_vectors.py:24-46 compound dtypes.
PY - <<'EOF'
import h5py
with h5py.File("logs/chain.bv.hdf5") as f:
    comm, pred = f["Communication"], f["Predictions"]
    assert set(comm.dtype.names) == {
        "ExampleId", "AgentId", "Index", "Target", "Rank", "BinaryProb",
        "BinaryVec"}, comm.dtype.names
    assert set(pred.dtype.names) == {
        "ExampleId", "AgentId", "Index", "Target", "Rank", "Predictions",
        "StopProb", "StopVec", "StopMask"}, pred.dtype.names
    assert len(comm) > 0 and len(pred) > 0
print("bv.hdf5 schema ok (Communication/Predictions compound dtypes)")
EOF

# L7: offline analysis.
PY "$REPO/tools/analyse_communication.py" ./logs/chain.bv.hdf5 \
   --out-dir ./analysis
echo "full chain complete: features, logs in $WORK/logs, analysis in $WORK/analysis"
