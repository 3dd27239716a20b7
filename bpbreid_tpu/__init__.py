"""bpbreid_tpu — a TPU-native JAX re-identification framework.

A ground-up rebuild of the BPBReID / Torchreid capability set
(part-based person re-identification with visibility-aware matching)
designed for TPU hardware: flax models compiled by XLA, Pallas kernels
for the hot pooling/distance/ranking ops, and jax.sharding meshes for
multi-chip data-parallel training and gallery-sharded retrieval.
"""
__version__ = '0.1.0'

from bpbreid_tpu import constants

__all__ = ['constants', '__version__']
