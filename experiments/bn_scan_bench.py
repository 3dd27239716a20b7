"""Round-4: honest BN/conv micro-bench with in-jit scan repetition.

The round-3 lane_packing_bench timed ONE op per dispatch; through the
tunneled backend every dispatch carries ~2-3 ms of latency, so all
sub-3ms kernels measured the tunnel, not the chip. Here each measured
quantity runs K times inside a single jitted lax.scan (output of one
iteration feeds the next, so XLA cannot CSE/hoist), and we report
(total - overhead) / K.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

K_REPS = 50


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
    return (time.perf_counter() - t0) / n * 1e3  # ms per call


def scanned(body, k=K_REPS):
    """Run body k times inside one jit, chaining the carry."""
    @jax.jit
    def run(x, *rest):
        def step(c, _):
            return body(c, *rest), ()
        y, _ = jax.lax.scan(step, x, None, length=k)
        return y
    return run


def per_iter_ms(body, x, *rest, k=K_REPS):
    f = scanned(body, k)
    t_full = timeit(f, x, *rest)
    f1 = scanned(body, 1)
    t_one = timeit(f1, x, *rest)
    return (t_full - t_one) / (k - 1), t_one


def bn_stats(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mu)
    # fold stats back so the carry depends on them (no DCE)
    return (x * (1.0 + 0 * mu.astype(x.dtype).sum())).astype(x.dtype) \
        + (mu + var).astype(x.dtype).mean() * 0


def bn_full_train(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return jnp.maximum(y, 0).astype(x.dtype)


def conv_bn(x, w, scale, bias):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return bn_full_train(y, scale, bias)


def conv_only(x, w):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return jnp.maximum(y, 0)


def conv_bn_grad_body(x, w, scale, bias):
    # fwd+bwd of one conv+BN+relu, carry = x-like
    def loss(w_, s_, b_, x_):
        return jnp.sum(conv_bn(x_, w_, s_, b_).astype(jnp.float32))
    g = jax.grad(loss, argnums=3)(w, scale, bias, x)
    return g.astype(x.dtype)


def main():
    print("backend:", jax.devices())
    key = jax.random.PRNGKey(0)
    bw_gbs = lambda mb, ms: mb / 1024.0 / (ms / 1e3)  # noqa: E731

    shapes = [
        (64, 96, 32, 32),    # branch0 train
        (64, 48, 16, 64),    # branch1 train
        (64, 24, 8, 128),    # branch2 train
        (64, 12, 4, 256),    # branch3 train
        (64, 96, 32, 256),   # layer1 (stem bottleneck out)
    ]
    print("\n== bare BN train statistics+normalize (bf16 in, f32 stats) ==")
    for shp in shapes:
        x = jax.random.normal(key, shp, jnp.bfloat16)
        s = jnp.ones((shp[-1],)); b = jnp.zeros((shp[-1],))
        ms, t1 = per_iter_ms(bn_full_train, x, s, b)
        mb = np.prod(shp) * 2 / 1e6
        print(f"  {str(shp):<20} {ms:7.4f} ms/iter  ({mb:6.1f} MB io x2 -> "
              f"{bw_gbs(2*mb, ms):6.0f} GB/s)   one-dispatch={t1:6.3f} ms")

    print("\n== conv3x3 + BN(train) + relu, fwd only ==")
    for shp in shapes[:4]:
        c = shp[-1]
        x = jax.random.normal(key, shp, jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, c), jnp.float32) * 0.05
        s = jnp.ones((c,)); b = jnp.zeros((c,))
        ms, _ = per_iter_ms(conv_bn, x, w, s, b)
        ms_c, _ = per_iter_ms(conv_only, x, w)
        print(f"  {str(shp):<20} conv+bn {ms:7.4f}  conv-only {ms_c:7.4f} "
              f"ms/iter  (bn adds {ms - ms_c:7.4f})")

    print("\n== conv3x3 + BN(train) + relu, fwd+bwd(x) ==")
    for shp in shapes[:4]:
        c = shp[-1]
        x = jax.random.normal(key, shp, jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, c), jnp.float32) * 0.05
        s = jnp.ones((c,)); b = jnp.zeros((c,))
        ms, _ = per_iter_ms(conv_bn_grad_body, x, w, s, b, k=20)
        print(f"  {str(shp):<20} {ms:7.4f} ms/iter")


if __name__ == '__main__':
    main()
