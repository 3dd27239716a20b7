"""Round-5 negative result: MXU ones-dot BN statistics vs XLA reduce.

The train-step profile attributes ~23 ms/step (batch 64) to BN
statistic+gradient reductions (convert_reduce fusions over ~270 BN
sites). Hypothesis tested here: computing the fused (sum, sum-of-
squares) via MXU matmuls — ``ones[1,M] @ x[M,C]`` and
``ones @ (x*x)`` — beats the VPU reduce.

Measured (one TPU v5e chip, 2026-08-20, K=100 iterations inside one
``lax.scan`` so the tunnel's per-dispatch latency is amortized —
naive per-dispatch microbenches measure 1.5-3 ms of fixed dispatch
cost and nothing else):

    shape                reduce      ones-dot   1-read roofline
    (64, 96, 32, 256)    0.229 ms    0.229 ms   0.123 ms
    (64, 96, 32,  64)    0.153 ms    0.158 ms   0.031 ms
    (64, 96, 32,  32)    0.118 ms    0.129 ms   0.015 ms
    (64, 48, 16,  64)    0.137 ms    0.120 ms   0.008 ms
    (64, 24,  8, 128)    0.100 ms    0.111 ms   0.004 ms

Identical within noise at every shape (small-shape rows are dominated
by the ~0.1 ms per-scan-iteration floor). The reduce is not 2x off
roofline either: (s1, s2) is TWO f32 accumulates over every element,
and the VPU accumulate bound (~1-2 T f32 ops/s) lands exactly at the
measured 0.23 ms for the largest shape — the kernel is at its
hardware bound, not poorly scheduled. Fifth documented BN-statistics
attempt after round 4's FastBatchNorm custom-VJP (the win that
shipped), the lane-dense [M,128] reshape (84 -> 231 ms regression),
the Pallas VMEM/MXU kernel (experiments/pallas_bn_v2.py, slower at
every shape), and the composed-resample/Gram reductions. Conclusion:
BN statistic time at exact reference semantics is irreducible on this
chip; the train step's ~79.7 ms floor stands.

Run: ``python experiments/bn_sum_dot.py`` (on the TPU chip).
"""
import os
import os.path as osp
import time

import jax

if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('BPBREID_TPU_COMPILE_CACHE',
                                 osp.expanduser('~/.cache/bpbreid_tpu_jax')))

import jax.numpy as jnp
import numpy as np

K = 100
SHAPES = [(64, 96, 32, 256), (64, 96, 32, 64), (64, 96, 32, 32),
          (64, 48, 16, 64), (64, 24, 8, 128)]


def bench(make_body, x):
    @jax.jit
    def run(x):
        def body(carry, i):
            s1, s2 = make_body(x + carry.astype(x.dtype) * 0)
            # fold results into the carry so no iteration is dead code;
            # perturb the input per step so the body cannot be hoisted
            return carry + s1.sum() + s2.sum() + i.astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(K, dtype=jnp.int32))
        return out

    float(run(x))
    t0 = time.perf_counter()
    for _ in range(3):
        o = run(x)
    float(o)
    return (time.perf_counter() - t0) / (3 * K) * 1e3


def main():
    for shp in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), shp, jnp.bfloat16)
        c = shp[-1]

        def red(x):
            xf = x.astype(jnp.float32)
            return xf.sum(axis=(0, 1, 2)), (xf * xf).sum(axis=(0, 1, 2))

        def dot_s1s2(x, c=c):
            x2 = x.reshape(-1, c).astype(jnp.float32)
            ones = jnp.ones((1, x2.shape[0]), jnp.float32)
            return (ones @ x2)[0], (ones @ (x2 * x2))[0]

        # correctness
        a, b = jax.jit(red)(x)
        a2, b2 = jax.jit(dot_s1s2)(x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(a2),
                                   rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(b), np.asarray(b2),
                                   rtol=1e-4, atol=1e-2)

        t_red = bench(red, x)
        t_dot = bench(dot_s1s2, x)
        roof = x.size * 2 / 819e9 * 1e3
        print(f'{shp}: reduce {t_red:.4f} ms | ones-dot {t_dot:.4f} ms '
              f'| 1-read roofline {roof:.4f} ms', flush=True)


if __name__ == '__main__':
    main()
