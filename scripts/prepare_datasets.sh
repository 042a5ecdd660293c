#!/bin/bash
# Dataset preparation — the canonical conversion commands
# (counterpart of the reference's prepare_datasets.sh).
#
# Adjust DATA_ROOT / OUT_ROOT, then run the sections you need. Inspect
# the outputs afterwards with:
#   python -m human_dynamics_tpu.datasets.visualize_records --record <f>
set -e

DATA_ROOT=${DATA_ROOT:-/data/raw}
OUT_ROOT=${OUT_ROOT:-/data/tf_datasets}
RESNET_CKPT=${RESNET_CKPT:-models/hmr_noS5.ckpt-642561}  # for phi extraction

# --- Penn Action ------------------------------------------------------
python -m human_dynamics_tpu.datasets.penn_action \
    --data_dir "$DATA_ROOT/Penn_Action" \
    --out_dir "$OUT_ROOT/penn_action" \
    --split train --resnet_ckpt "$RESNET_CKPT"
python -m human_dynamics_tpu.datasets.penn_action \
    --data_dir "$DATA_ROOT/Penn_Action" \
    --out_dir "$OUT_ROOT/penn_action" --split test

# --- InstaVariety -----------------------------------------------------
python -m human_dynamics_tpu.datasets.insta_variety \
    --track_dir "$DATA_ROOT/insta_variety/tracks" \
    --frame_root "$DATA_ROOT/insta_variety/frames" \
    --out_dir "$OUT_ROOT/insta_variety" \
    --resnet_ckpt "$RESNET_CKPT"

# --- 3DPW (test records) ----------------------------------------------
python -m human_dynamics_tpu.datasets.tdpw \
    --data_dir "$DATA_ROOT/3DPW" --out_dir "$OUT_ROOT/3dpw" --split test

# --- Human3.6M (preprocessed sequence dirs; see datasets/h36m.py) ------
for split in train val test; do
  python -m human_dynamics_tpu.datasets.h36m \
      --data_dir "$DATA_ROOT/h36m_processed" \
      --out_dir "$OUT_ROOT/h36m" --split $split \
      --resnet_ckpt "$RESNET_CKPT"
done

# --- Mosh mocap (adversarial prior) ------------------------------------
python -m human_dynamics_tpu.datasets.mocap \
    --mosh_dir "$DATA_ROOT/neutrMosh" --out_dir "$OUT_ROOT" \
    --datasets CMU H3.6 jointLim
python -m human_dynamics_tpu.datasets.mocap \
    --mosh_dir "$DATA_ROOT/neutrMosh" --out_dir "$OUT_ROOT" \
    --datasets CMU H3.6 jointLim --temporal
