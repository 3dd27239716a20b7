"""Checkpoint save / load / resume.

Mirrors the reference semantics
(reference: torchreid/utils/torchtools.py:24-137): each checkpoint
stores model params + optimizer state + epoch + eval metrics + the FULL
config, written as ``job-{id}_{epoch}_model.ckpt`` with a
``model-best.ckpt`` copy. Serialization uses flax msgpack (pure arrays)
plus a json sidecar for metadata — readable from any jax process without
pickle trust issues.
"""
import json
import os
import os.path as osp
import shutil

import numpy as np
from flax import serialization

__all__ = ['save_checkpoint', 'load_checkpoint', 'resume_from_checkpoint']


def _ensure_dir(d):
    if d and not osp.exists(d):
        os.makedirs(d, exist_ok=True)


def save_checkpoint(state_dict, save_dir, job_id=0, epoch=0, is_best=False,
                    name='model'):
    """Save a checkpoint.

    Args:
        state_dict: dict with a ``state`` pytree (TrainState) and metadata
            entries (epoch, rank1, mAP, ssmd, config).
    Returns the checkpoint path.
    """
    _ensure_dir(save_dir)
    path = osp.join(save_dir, 'job-{}_{}_{}.ckpt'.format(job_id, epoch, name))
    state = state_dict.get('state')
    payload = serialization.to_bytes(serialization.to_state_dict(state))
    with open(path, 'wb') as f:
        f.write(payload)
    meta = {k: v for k, v in state_dict.items() if k != 'state'}
    with open(path + '.meta.json', 'w') as f:
        json.dump(meta, f, default=str)
    if is_best:
        best = osp.join(save_dir, '{}-best.ckpt'.format(name))
        shutil.copy(path, best)
        shutil.copy(path + '.meta.json', best + '.meta.json')
    print('Checkpoint saved to "{}"'.format(path))
    return path


def load_checkpoint(path, target_state=None):
    """Load a checkpoint; returns (state, meta).

    ``target_state`` supplies the pytree structure (e.g. a freshly
    initialized TrainState); required to restore typed arrays.
    """
    if not osp.exists(path):
        raise FileNotFoundError('File is not found at "{}"'.format(path))
    with open(path, 'rb') as f:
        payload = f.read()
    meta = {}
    if osp.exists(path + '.meta.json'):
        with open(path + '.meta.json') as f:
            meta = json.load(f)
    if target_state is None:
        state = serialization.msgpack_restore(payload)
    else:
        restored = serialization.msgpack_restore(payload)
        state = serialization.from_state_dict(target_state, restored)
    return state, meta


def resume_from_checkpoint(path, target_state):
    """Restore state + start epoch (reference: torchtools.py:101-137)."""
    print('Loading checkpoint from "{}"'.format(path))
    state, meta = load_checkpoint(path, target_state)
    start_epoch = int(meta.get('epoch', -1)) + 1
    print('Last epoch = {}'.format(start_epoch))
    if meta.get('rank1') is not None:
        print('Last rank1 = {:.1%}'.format(float(meta['rank1'])))
    return state, start_epoch, meta
