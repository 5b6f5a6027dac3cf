#!/usr/bin/env python
"""Run phase-1 distillation in bounded chunks of epochs, one process per
chunk — works around the tunneled-TPU client's host-mirror growth
(~7 GB/epoch even with donation + syncs) by giving each chunk a fresh
process. Resume is the ordinary checkpoint contract.

Usage: python tools/phase1_chunk.py --init ckpts/image_full/phase0/model-2 \
           --workdir ckpts/image_full/phase1 --epochs 8
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--init', required=True,
                    help='phase-0 ckpt (fresh start) — ignored when the '
                         'workdir already has phase-1 checkpoints')
    ap.add_argument('--workdir', default='ckpts/image_full/phase1')
    ap.add_argument('--data', default='ckpts/image_full/data')
    ap.add_argument('--teacher', default='ckpts/priv_full/priv/model-32')
    ap.add_argument('--epochs', type=int, default=8)
    ap.add_argument('--samples', type=int, default=250)
    ap.add_argument('--batch', type=int, default=64)
    args = ap.parse_args()

    from lbc_tpu.cli.train_image import train as train_image
    from lbc_tpu.train.checkpoints import latest_checkpoint

    work = Path(args.workdir)
    # chunks live in numbered subdirs so each one's model-{epoch} files
    # don't clobber the previous chunk's
    ckpt = args.init
    n = 1
    epoch_offset = 0
    while (work / f'chunk{n:02d}').exists():
        # accumulate the epochs each chunk ACTUALLY completed (chunks can
        # die early — OOM killer) so the sampler order / augmentation
        # anneal / RNG stream continue instead of replaying chunk 1
        # (each epoch loop runs epochs 0..max_epoch inclusive)
        done = latest_checkpoint(work / f'chunk{n:02d}')
        if done is not None:
            epoch_offset += int(str(done).rsplit('-', 1)[1]) + 1
        else:
            epoch_offset += args.epochs + 1
        n += 1
    if n > 1:
        prev = latest_checkpoint(work / f'chunk{n - 1:02d}')
        if prev is not None:
            ckpt = str(prev)
    log_dir = work / f'chunk{n:02d}'
    print(f'[phase1_chunk] chunk {n}: init from {ckpt} '
          f'(epoch_offset {epoch_offset})', flush=True)

    cfg = {
        'phase': 1, 'log_dir': str(log_dir), 'max_epoch': args.epochs,
        'batch_size': args.batch, 'samples_per_epoch': args.samples,
        'augment': True, 'seed': 0, 'speed_noise': 1.0,
        'epoch_offset': epoch_offset,
        'ckpt': ckpt,
        'model_args': {'model': 'image_ss', 'backbone': 'resnet34'},
        'teacher_args': {'model_path': args.teacher,
                         'backbone': 'resnet18'},
        'data_args': {'dataset_dir': args.data, 'max_frames': None},
        'optimizer_args': {'lr': 1e-4},
        'camera_args': {'w': 384, 'h': 160, 'fov': 90, 'world_y': 1.4,
                        'fixed_offset': 4.0},
    }
    train_image(cfg)
    print('[phase1_chunk] DONE', flush=True)


if __name__ == '__main__':
    main()
