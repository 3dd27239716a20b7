"""Device-mesh helpers for data-parallel training and gallery-sharded
retrieval.

The reference scales with single-host ``nn.DataParallel``
(reference: torchreid/scripts/main.py:257). Here parallelism is
expressed through ``jax.sharding``: a 1-D ``data`` mesh for training
(batch sharded, params replicated — XLA inserts the gradient psum over
ICI) and the same mesh re-used over the gallery axis at retrieval time
(the framework's 'sequence parallelism' — SURVEY §5).
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'replicate', 'shard_batch_spec', 'shard_array',
           'DATA_AXIS']

DATA_AXIS = 'data'


def make_mesh(n_devices=None, devices=None):
    """1-D data mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicate(mesh):
    """Sharding that replicates a pytree across the mesh."""
    return NamedSharding(mesh, P())


def shard_batch_spec(mesh):
    """Sharding for an array whose leading axis is the batch."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_array(x, mesh, axis=0):
    """Place an array sharded along ``axis``; pads implicitly unsupported —
    caller must ensure divisibility."""
    spec = [None] * x.ndim
    spec[axis] = DATA_AXIS
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
