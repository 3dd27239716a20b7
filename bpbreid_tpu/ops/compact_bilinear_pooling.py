"""Compact Bilinear Pooling (CountSketch + FFT).

Rebuild of the reference module
(torchreid/models/compact_bilinear_pooling.py:7-286, Gao et al. CVPR16):
the bilinear (outer-product) pooling of two feature vectors is
approximated by the circular convolution of their count sketches,
computed in the frequency domain. The torch version implements custom
scatter/complex autograd Functions; jnp scatter-add and rfft are
natively differentiable so the whole thing is a few lines and jit/vmap
friendly.
"""
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['CountSketch', 'CompactBilinearPooling', 'count_sketch',
           'compact_bilinear_pooling']


def make_sketch_params(input_size, output_size, seed=0):
    """Random hash (h) and sign (s) vectors (reference: :86-99)."""
    rng = np.random.default_rng(seed)
    h = rng.integers(0, output_size, input_size)
    s = 2.0 * rng.integers(0, 2, input_size) - 1.0
    return jnp.asarray(h, jnp.int32), jnp.asarray(s, jnp.float32)


def count_sketch(x, h, s, output_size):
    """Count sketch over the last axis: out[..., h[i]] += s[i] * x[..., i]
    (reference CountSketchFn_forward, :7-28)."""
    xs = x * s
    out_shape = x.shape[:-1] + (output_size,)
    out = jnp.zeros(out_shape, x.dtype)
    return out.at[..., h].add(xs)


def compact_bilinear_pooling(x, y, hx, sx, hy, sy, output_size):
    """CBP of two [..., D] signals -> [..., output_size]."""
    px = count_sketch(x, hx, sx, output_size)
    py = count_sketch(y, hy, sy, output_size)
    fx = jnp.fft.rfft(px, axis=-1)
    fy = jnp.fft.rfft(py, axis=-1)
    return jnp.fft.irfft(fx * fy, n=output_size, axis=-1)


class CountSketch:
    def __init__(self, input_size, output_size, seed=0, h=None, s=None):
        self.input_size = input_size
        self.output_size = output_size
        if h is None or s is None:
            h, s = make_sketch_params(input_size, output_size, seed)
        self.h, self.s = h, s

    def __call__(self, x):
        return count_sketch(x, self.h, self.s, self.output_size)


class CompactBilinearPooling:
    """(reference CompactBilinearPooling module, :196-286)"""

    def __init__(self, input1_size, input2_size, output_size, seed=0):
        self.output_size = output_size
        self.hx, self.sx = make_sketch_params(input1_size, output_size, seed)
        self.hy, self.sy = make_sketch_params(input2_size, output_size,
                                              seed + 1)

    def __call__(self, x, y=None):
        y = x if y is None else y
        return compact_bilinear_pooling(x, y, self.hx, self.sx, self.hy,
                                        self.sy, self.output_size)
