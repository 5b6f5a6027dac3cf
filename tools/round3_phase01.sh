#!/bin/bash
# Round-3 offline distillation at reference budget, device-resident:
# phase 0 (camera-space warmup, batch 96 x 2 epochs) then phase 1
# (map-space, batch 24 x 256 epochs, super_hard) — defaults per
# training/train_image_phase{0,1}.py:247-289. One process each; the
# resident trainer keeps RSS flat (train/resident.py).
set -u
cd "$(dirname "$0")/.."
stamp() { echo "[r3p01 $(date +%H:%M:%S)] $*"; }

TEACHER=ckpts/priv_full/priv/model-32
DATA=ckpts/image_full/data

if [ ! -f ckpts/image_r3/phase0/model-2/params.npz ] && [ ! -d ckpts/image_r3/phase0/model-2 ]; then
  stamp "phase 0"
  python -m lbc_tpu.cli.train_image --phase 0 --resident \
    --dataset_dir "$DATA" --teacher-path "$TEACHER" \
    --log_dir ckpts/image_r3/phase0 \
    --batch_size 96 --max_epoch 2 --samples_per_epoch 1000 \
    --no-augment || { stamp "phase 0 FAILED"; exit 1; }
fi

stamp "phase 1"
python -m lbc_tpu.cli.train_image --phase 1 --resident \
  --dataset_dir "$DATA" --teacher-path "$TEACHER" \
  --ckpt ckpts/image_r3/phase0/model-2 \
  --log_dir ckpts/image_r3/phase1 \
  --batch_size 24 --max_epoch 256 --samples_per_epoch 1000 \
  --augment super_hard || { stamp "phase 1 FAILED"; exit 1; }
stamp "DONE"
