"""Round-4 experiment: is 2x2 space-to-depth lane packing a win for the
narrow-channel HRNet branches?

Hypotheses (VERDICT round 3, items 1-2):
  (a) [N,H,W,32] activations are lane-padded (32 -> 128) in HBM, so the
      32-ch branch convs + BN reductions move up to 4x the logical bytes.
  (b) Packing 2x2 spatial blocks into channels ([N,H,W,32] ->
      [N,H/2,W/2,128]) makes every elementwise/BN/reduce op lane-dense.
      The folded dense packed conv does 4x the MACs (3/4 structurally
      zero) -- fine if the op is memory-bound.

Measures, on whatever backend is active (run on the real chip):
  1. HBM allocation size of the two layouts (memory_analysis).
  2. 8-deep 3x3 conv chain fwd, bf16 + int8, batch 256 (inference shape).
  3. conv+BN+relu chain fwd+bwd, bf16, batch 64 (train shape).
  4. bare BN-statistics reduction both layouts.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def _force(out):
    # device->host readback of one scalar: the TPU executes enqueued
    # programs in order, so reading anything from the LAST call's output
    # waits for every preceding program. block_until_ready under-reports
    # through the tunneled backend (see IMPLEMENTATION_STATUS.md).
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.ravel()[0]))


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def mem_report(shape, dtype):
    f = jax.jit(lambda x: x * 2.0)
    m = f.lower(jax.ShapeDtypeStruct(shape, dtype)).compile().memory_analysis()
    print(f"  {shape} {dtype.__name__}: output={m.output_size_in_bytes:,} "
          f"args={m.argument_size_in_bytes:,} temp={m.temp_size_in_bytes:,} "
          f"(logical={int(np.prod(shape)) * np.dtype(dtype).itemsize:,})")


def conv_chain(x, ws, strides=1):
    for w in ws:
        x = jax.lax.conv_general_dilated(
            x, w, (strides, strides), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = jnp.maximum(x, 0)
    return x


def conv_chain_int8(x, ws):
    # static-scale int8: quantize activation, int8 conv w/ int32 accum
    for w in ws:
        xq = jnp.clip(jnp.round(x * 4.0), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(w * 64.0), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        x = jnp.maximum(y.astype(jnp.bfloat16) * (1.0 / 256.0), 0)
    return x


def bn_train_step(x, scale, bias):
    # flax-style train BN: f32 stats, normalize, relu
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return jnp.maximum(y, 0).astype(x.dtype), mu, var


def bn_train_step_reshaped(x, scale, bias):
    """Same BN but all reduces/elementwise run on a lane-dense [X,128]
    row-major reshape VIEW of the NHWC tensor (layout-preserving when the
    array is dense): channels repeat with period C along the 128 lanes,
    so per-channel stats are a [X,128] reduce + a tiny [128/C, C] fold,
    and per-channel affine params tile to 128 lanes."""
    n, h, w, c = x.shape
    rep = 128 // c                       # channel tile repeat count
    xr = x.reshape(n, h, (w * c) // 128, 128)
    xf = xr.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(0, 1, 2))             # [128]
    s2 = jnp.sum(jnp.square(xf), axis=(0, 1, 2))
    cnt = n * h * w
    mu = s1.reshape(rep, c).sum(0) / cnt          # [C]
    var = s2.reshape(rep, c).sum(0) / cnt - jnp.square(mu)
    mul = (jax.lax.rsqrt(var + 1e-5) * scale)
    add = bias - mu * mul
    mul_t = jnp.tile(mul, rep)
    add_t = jnp.tile(add, rep)
    y = jnp.maximum(xf * mul_t + add_t, 0).astype(x.dtype)
    return y.reshape(n, h, w, c), mu, var


def conv_bn_chain_loss_reshaped(ws, scales, biases, x):
    for w, s, b in zip(ws, scales, biases):
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x, _, _ = bn_train_step_reshaped(x, s, b)
    return jnp.sum(x.astype(jnp.float32))


def conv_bn_chain_loss(ws, scales, biases, x):
    for w, s, b in zip(ws, scales, biases):
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x, _, _ = bn_train_step(x, s, b)
    return jnp.sum(x.astype(jnp.float32))


def main():
    print("backend:", jax.devices())
    key = jax.random.PRNGKey(0)

    print("\n== 1. HBM layout padding probe ==")
    for shape in [(256, 96, 32, 32), (256, 48, 16, 128),
                  (64, 96, 32, 32), (64, 48, 16, 128),
                  (256, 48, 16, 64), (256, 48, 8, 128)]:
        mem_report(shape, jnp.bfloat16 if True else np.float32)

    DEPTH = 8
    print(f"\n== 2. {DEPTH}-deep 3x3 conv chain fwd, batch 256 ==")
    xu = jax.random.normal(key, (256, 96, 32, 32), jnp.bfloat16)
    xp = jax.random.normal(key, (256, 48, 16, 128), jnp.bfloat16)
    wu = [jax.random.normal(key, (3, 3, 32, 32), jnp.bfloat16) * 0.1
          for _ in range(DEPTH)]
    wp = [jax.random.normal(key, (3, 3, 128, 128), jnp.bfloat16) * 0.05
          for _ in range(DEPTH)]
    f_u = jax.jit(conv_chain)
    f_p = jax.jit(conv_chain)
    t_u = timeit(f_u, xu, wu)
    t_p = timeit(f_p, xp, wp)
    print(f"  bf16 unpacked [256,96,32,32] c32 : {t_u:7.3f} ms")
    print(f"  bf16 packed   [256,48,16,128] c128: {t_p:7.3f} ms   "
          f"({t_u / t_p:.2f}x)")
    g_u = jax.jit(conv_chain_int8)
    g_p = jax.jit(conv_chain_int8)
    t_u8 = timeit(g_u, xu, wu)
    t_p8 = timeit(g_p, xp, wp)
    print(f"  int8 unpacked: {t_u8:7.3f} ms")
    print(f"  int8 packed  : {t_p8:7.3f} ms   ({t_u8 / t_p8:.2f}x)")

    # 64-ch branch shapes (1/8 scale), 1x2 packing -> 128
    xu64 = jax.random.normal(key, (256, 48, 16, 64), jnp.bfloat16)
    xp64 = jax.random.normal(key, (256, 48, 8, 128), jnp.bfloat16)
    wu64 = [jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.1
            for _ in range(DEPTH)]
    wp64 = [jax.random.normal(key, (3, 3, 128, 128), jnp.bfloat16) * 0.05
            for _ in range(DEPTH)]
    t_u64 = timeit(f_u, xu64, wu64)
    t_p64 = timeit(f_p, xp64, wp64)
    print(f"  bf16 64ch unpacked [256,48,16,64]: {t_u64:7.3f} ms")
    print(f"  bf16 64ch packed   [256,48,8,128]: {t_p64:7.3f} ms  "
          f"({t_u64 / t_p64:.2f}x)")
    t_u648 = timeit(g_u, xu64, wu64)
    t_p648 = timeit(g_p, xp64, wp64)
    print(f"  int8 64ch unpacked: {t_u648:7.3f} ms")
    print(f"  int8 64ch packed  : {t_p648:7.3f} ms  ({t_u648 / t_p648:.2f}x)")

    print(f"\n== 3. conv+BN(train)+relu chain fwd+bwd, batch 64 ==")
    xu_t = jax.random.normal(key, (64, 96, 32, 32), jnp.bfloat16)
    xp_t = jax.random.normal(key, (64, 48, 16, 128), jnp.bfloat16)
    wu_f = [w.astype(jnp.float32) for w in wu]
    wp_f = [w.astype(jnp.float32) for w in wp]
    su = [jnp.ones((32,)) for _ in range(DEPTH)]
    bu = [jnp.zeros((32,)) for _ in range(DEPTH)]
    sp = [jnp.ones((128,)) for _ in range(DEPTH)]
    bp = [jnp.zeros((128,)) for _ in range(DEPTH)]
    grad_u = jax.jit(jax.grad(conv_bn_chain_loss, argnums=(0, 1, 2)))
    grad_p = jax.jit(jax.grad(conv_bn_chain_loss, argnums=(0, 1, 2)))
    grad_r = jax.jit(jax.grad(conv_bn_chain_loss_reshaped, argnums=(0, 1, 2)))
    t_gu = timeit(grad_u, wu_f, su, bu, xu_t, n=10)
    t_gp = timeit(grad_p, wp_f, sp, bp, xp_t, n=10)
    t_gr = timeit(grad_r, wu_f, su, bu, xu_t, n=10)
    print(f"  unpacked fwd+bwd        : {t_gu:7.3f} ms")
    print(f"  packed   fwd+bwd        : {t_gp:7.3f} ms   ({t_gu / t_gp:.2f}x)")
    print(f"  unpacked+reshapeBN f+bwd: {t_gr:7.3f} ms   ({t_gu / t_gr:.2f}x)")

    # 64-ch train shapes
    xu64_t = jax.random.normal(key, (64, 48, 16, 64), jnp.bfloat16)
    wu64_f = [w.astype(jnp.float32) for w in wu64]
    su64 = [jnp.ones((64,)) for _ in range(DEPTH)]
    bu64 = [jnp.zeros((64,)) for _ in range(DEPTH)]
    t_gu64 = timeit(grad_u, wu64_f, su64, bu64, xu64_t, n=10)
    t_gr64 = timeit(grad_r, wu64_f, su64, bu64, xu64_t, n=10)
    print(f"  64ch unpacked fwd+bwd   : {t_gu64:7.3f} ms")
    print(f"  64ch +reshapeBN fwd+bwd : {t_gr64:7.3f} ms  ({t_gu64 / t_gr64:.2f}x)")

    print(f"\n== 4. bare BN statistics (mean + mean-sq, f32 accum) ==")
    bn_u = jax.jit(lambda x: bn_train_step(x, jnp.ones((x.shape[-1],)),
                                           jnp.zeros((x.shape[-1],))))
    bn_r = jax.jit(lambda x: bn_train_step_reshaped(
        x, jnp.ones((x.shape[-1],)), jnp.zeros((x.shape[-1],))))
    t_bu = timeit(bn_u, xu_t)
    t_bp = timeit(bn_u, xp_t)
    t_br = timeit(bn_r, xu_t)
    print(f"  unpacked [64,96,32,32]     : {t_bu:7.3f} ms")
    print(f"  packed   [64,48,16,128]    : {t_bp:7.3f} ms   ({t_bu / t_bp:.2f}x)")
    print(f"  unpacked + reshape trick   : {t_br:7.3f} ms   ({t_bu / t_br:.2f}x)")
    # correctness of the reshape trick
    y0, m0, v0 = bn_u(xu_t)
    y1, m1, v1 = bn_r(xu_t)
    print("  reshape-trick parity: mu", float(jnp.abs(m0 - m1).max()),
          "var", float(jnp.abs(v0 - v1).max()),
          "y", float(jnp.abs(y0.astype(jnp.float32)
                             - y1.astype(jnp.float32)).max()))


if __name__ == '__main__':
    main()
