"""Round-4: can a Pallas reduce beat XLA's convert_reduce for BN train
statistics on the narrow-channel HRNet branch shapes?

The round-4 train profile shows ~35 ms/step of convert_reduce fusions,
concentrated on 32/64-channel activations — per-op times 5-15x off the
HBM roofline, consistent with lane-sparse reductions (C < 128 lanes).
The candidate fix: view the activation as a flat [M, 128] lane-dense
array (channels repeat with period C along lanes), reduce that, and
fold the [128] partial into [C] at the end. Measured here both as a
pure-XLA reshape and as a Pallas kernel, with in-jit scan repetition
(per-dispatch tunnel latency ~2-3 ms would otherwise swamp every
kernel; see bn_scan_bench.py).
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_REPS = 30


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.ravel()[0]))


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / n * 1e3


def scanned_stats(stats_fn, k=K_REPS):
    """Chain: x -> stats -> fold a scalar back into x so nothing DCEs."""
    @jax.jit
    def run(x):
        def step(c, _):
            s1, s2 = stats_fn(c)
            bump = (s1.sum() + s2.sum()).astype(c.dtype) * 1e-9
            return c + bump, ()
        y, _ = jax.lax.scan(step, x, None, length=k)
        return y
    return run


def xla_stats(x):
    xf = x.astype(jnp.float32)
    return xf.sum(axis=(0, 1, 2)), (xf * xf).sum(axis=(0, 1, 2))


def xla_stats_lanes(x):
    n, h, w, c = x.shape
    rep = 128 // c
    xr = x.reshape(-1, 128).astype(jnp.float32)
    s1 = xr.sum(0).reshape(rep, c).sum(0)
    s2 = (xr * xr).sum(0).reshape(rep, c).sum(0)
    return s1, s2


def _bn_stats_kernel(x_ref, s1_ref, s2_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    xf = x_ref[:].astype(jnp.float32)          # [block, 128]
    s1_ref[:] += jnp.sum(xf, axis=0, keepdims=True)
    s2_ref[:] += jnp.sum(xf * xf, axis=0, keepdims=True)


def pallas_stats(x, block=2048):
    n, h, w, c = x.shape
    m = (n * h * w * c) // 128
    xr = x.reshape(m, 128)
    grid = (m // block,)
    s1, s2 = pl.pallas_call(
        _bn_stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block, 128), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((1, 128), lambda i: (0, 0)),
                   pl.BlockSpec((1, 128), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)],
    )(xr)
    rep = 128 // c
    return (s1.reshape(rep, c).sum(0), s2.reshape(rep, c).sum(0))


def main():
    print("backend:", jax.devices())
    key = jax.random.PRNGKey(0)
    shapes = [(64, 96, 32, 32), (64, 48, 16, 64), (64, 96, 32, 64),
              (64, 96, 32, 256)]
    for shp in shapes:
        x = jax.random.normal(key, shp, jnp.bfloat16)
        mb = np.prod(shp) * 2 / 1e6
        f_x = scanned_stats(xla_stats)
        f_l = scanned_stats(xla_stats_lanes)
        f_p = scanned_stats(pallas_stats)
        # correctness first
        s_ref = xla_stats(x)
        for name, fn in (('lanes', xla_stats_lanes), ('pallas', pallas_stats)):
            s = fn(x)
            err = max(float(jnp.abs(s[0] - s_ref[0]).max()),
                      float(jnp.abs(s[1] - s_ref[1]).max()))
            assert err < 2.0, (name, shp, err)   # f32 sum assoc noise
        t_x = timeit(f_x, x)
        t_l = timeit(f_l, x)
        t_p = timeit(f_p, x)
        base = 2.0  # measured one-dispatch floor; relative numbers matter
        per = lambda t: (t - base) / K_REPS  # noqa: E731
        print(f"{str(shp):<20} ({mb:6.1f} MB) xla {per(t_x)*1e3:7.1f} us | "
              f"lane-reshape {per(t_l)*1e3:7.1f} us | "
              f"pallas {per(t_p)*1e3:7.1f} us "
              f"(roofline ~{mb/819e3*1e6:5.1f} us)")


if __name__ == '__main__':
    main()
