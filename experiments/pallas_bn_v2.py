"""Round-4 attempt 2: Pallas BN-stats kernel with a VMEM scratch
accumulator + MXU-dot row reduction, measured inside the real scan
harness (slices of a stacked array; see pallas_bn_bench.py lessons:
one-dispatch floor ~5 ms through the tunnel, LICM hoists unchained
bodies, so scan over distinct slices)."""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.ravel()[0]))


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / n * 1e3


def _stats_kernel(x_ref, s1_ref, s2_ref, acc_ref):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xf = x_ref[:].astype(jnp.float32)            # [block, c]
    ones = jnp.ones((1, xf.shape[0]), jnp.float32)
    s1 = jax.lax.dot_general(ones, xf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(ones, xf * xf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[0:1, :] += s1
    acc_ref[1:2, :] += s2

    @pl.when(i == n - 1)
    def _():
        s1_ref[:] = acc_ref[0:1, :]
        s2_ref[:] = acc_ref[1:2, :]


def pallas_stats(x, block=4096):
    c = x.shape[-1]
    m = x.size // c
    xr = x.reshape(m, c)
    while m % block:
        block //= 2
    s1, s2 = pl.pallas_call(
        _stats_kernel,
        grid=(m // block,),
        in_specs=[pl.BlockSpec((block, c), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((1, c), lambda i: (0, 0)),
                   pl.BlockSpec((1, c), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
    )(xr)
    return s1[0], s2[0]


def xla_stats(x):
    xf = x.astype(jnp.float32)
    return xf.sum(axis=(0, 1, 2)), (xf * xf).sum(axis=(0, 1, 2))


def sliced_scan(stats_fn, reshape4=False):
    @jax.jit
    def run(xs):
        def step(acc, xi):
            s1, s2 = stats_fn(xi)
            return acc + s1.sum() + s2.sum(), ()
        return jax.lax.scan(step, jnp.zeros((), jnp.float32), xs)[0]
    return run


def main():
    print("backend:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    K = 16
    for shp in [(64, 96, 32, 32), (64, 96, 32, 64), (64, 96, 32, 256)]:
        xs = jax.random.normal(key, (K,) + shp, jnp.bfloat16)
        mb = float(np.prod(shp)) * 2 / 1e6
        # correctness
        want = xla_stats(xs[0])
        got = pallas_stats(xs[0])
        err = max(float(jnp.abs(got[0] - want[0]).max()),
                  float(jnp.abs(got[1] - want[1]).max()))
        print(f"{shp} pallas err={err:.3f}", flush=True)
        for label, fn in (('xla', xla_stats), ('pallas', pallas_stats)):
            f = sliced_scan(fn)
            t1 = timeit(f, xs[:1], n=10)
            tk = timeit(f, xs, n=10)
            per = (tk - t1) / (K - 1)
            print(f"  {label:<7} {per*1e3:8.1f} us/slice -> "
                  f"{mb/per:6.0f} GB/s (roofline {mb/819e3*1e6:5.1f} us)",
                  flush=True)


if __name__ == '__main__':
    main()
