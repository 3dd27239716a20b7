"""int8 inference path (ops/quant.py): kernel correctness, calibration
round-trip, trace-time gating, and model-level accuracy preservation."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bpbreid_tpu.ops.quant import (int8_calibration, int8_inference,
                                   quant_conv, quant_mode)


def test_quant_conv_matches_dequantized_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 6, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 5)).astype(np.float32)
    sx = max(np.abs(x).max(), 1e-6) / 127.0

    got = np.asarray(quant_conv(jnp.asarray(x), jnp.asarray(w), (1, 1),
                                ((1, 1), (1, 1)), jnp.asarray(sx),
                                out_dtype=jnp.float32))

    # explicit int-math reference
    xq = np.clip(np.round(x / sx), -127, 127)
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-6) / 127.0
    wq = np.clip(np.round(w / sw), -127, 127)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros_like(got)
    for i in range(8):
        for j in range(6):
            patch = xp[:, i:i + 3, j:j + 3, :]            # [2,3,3,4]
            want[:, i, j, :] = np.einsum('nijc,ijcf->nf', patch, wq)
    want = want * (sx * sw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    # int8 error vs the exact float conv stays at quantization scale
    exact = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    rel = np.abs(got - np.asarray(exact)).max() / np.abs(exact).max()
    assert rel < 0.05, rel


def test_calibrate_then_int8_pconv():
    from bpbreid_tpu.models.common import PConv
    m = PConv(8, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
              dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 4)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    assert quant_mode() == 'off'
    y_f = m.apply(v, x)

    with int8_calibration():
        y_c, qvars = m.apply(v, x, mutable=['quant'])
    # calibration runs the float path and records per-channel |x|max
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_f))
    amax = np.asarray(qvars['quant']['act_amax'])
    np.testing.assert_allclose(
        amax, np.asarray(jnp.max(jnp.abs(x), axis=(0, 1, 2))))
    # running max across batches
    with int8_calibration():
        _, qvars2 = m.apply({**v, **qvars}, 0.5 * x, mutable=['quant'])
    np.testing.assert_allclose(np.asarray(qvars2['quant']['act_amax']),
                               amax)

    with int8_inference():
        assert quant_mode() == 'int8'
        y_q = m.apply({**v, **qvars}, x)
    assert quant_mode() == 'off'
    assert np.abs(np.asarray(y_f) - np.asarray(y_q)).max() > 0.0
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_f),
                               atol=0.05 * float(np.abs(y_f).max()))

    # uncalibrated inference falls back to a dynamic scale, same result
    with int8_inference():
        y_dyn = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_dyn), np.asarray(y_q),
                               atol=1e-6)


def test_quant_opts_static_arg_forces_retrace():
    """Round-3 regression: the mixed-precision knobs (skip patterns,
    shared points, activation granularity) are trace-time contextvars —
    invisible to the jit cache. QuantOpts passed as a static argument
    puts them in the cache key; without it, the second call with changed
    knobs silently reused the first compiled graph."""
    from functools import partial
    from bpbreid_tpu.models.common import PConv
    from bpbreid_tpu.ops.quant import QuantOpts

    m = PConv(8, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
              dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 8, 8, 4)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    with int8_calibration():
        _, qvars = m.apply(v, x, mutable=['quant'])
    vq = {**v, **qvars}

    @partial(jax.jit, static_argnames='quant_opts')
    def run(variables, x, quant_opts):
        with quant_opts.inference_context():
            return m.apply(variables, x)

    y_float = np.asarray(m.apply(v, x))
    y_pc = np.asarray(run(vq, x, QuantOpts(act_granularity='per_channel')))
    y_pt = np.asarray(run(vq, x, QuantOpts(act_granularity='per_tensor')))
    # '' matches every flax module path -> every conv stays float
    y_skip = np.asarray(run(vq, x, QuantOpts(skip_patterns=('',))))

    assert np.abs(y_pc - y_float).max() > 0          # int8 is active
    assert np.abs(y_pt - y_pc).max() > 0             # granularity knob acts
    np.testing.assert_array_equal(y_skip, y_float)   # skip-all == float


def test_reslayer_producer_quant_matches_consumer_shared():
    """Producer-side shared-int8 quantization (blocks RETURN a QTensor,
    quantized in the producing add+relu fusion with the tensor's own
    calibrated scale) is bit-identical to the consumer-side quantize it
    replaces (the next block quantizing its input with the same scale):
    both quantize the same float tensor with amax calibrated on that
    tensor. The relocation only changes WHERE the s8 copy is written —
    killing the bf16 HBM round-trip that dominated the int8 inference
    profile — never the values."""
    from bpbreid_tpu.models.common import BasicBlock, ResLayer

    producer = ResLayer(BasicBlock, 16, 3, quant_blocks=True)
    consumer = ResLayer(BasicBlock, 16, 3, quant_blocks=False)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    v = consumer.init(jax.random.PRNGKey(0), x)   # same params/names

    outs = {}
    for name, layer in (('producer', producer), ('consumer', consumer)):
        with int8_calibration():
            _, qvars = layer.apply(v, x, mutable=['quant'])
        with int8_inference(shared=True):
            outs[name] = np.asarray(layer.apply({**v, **qvars}, x))
    np.testing.assert_array_equal(outs['producer'], outs['consumer'])

    # float path and per-conv int8 are untouched by the knob
    np.testing.assert_array_equal(np.asarray(producer.apply(v, x)),
                                  np.asarray(consumer.apply(v, x)))
    for name, layer in (('producer', producer), ('consumer', consumer)):
        with int8_calibration():
            _, qvars = layer.apply(v, x, mutable=['quant'])
        with int8_inference(shared=False):
            outs[name] = np.asarray(layer.apply({**v, **qvars}, x))
    np.testing.assert_array_equal(outs['producer'], outs['consumer'])


@pytest.mark.slow
def test_int8_hrnet_preserves_features_and_ranking():
    """The calibrated int8 backbone must keep BPBreID embeddings close
    enough that retrieval order is unchanged (the accuracy-parity
    argument for running the headline bench at int8)."""
    from bpbreid_tpu.models.bpbreid import BPBreID
    from bpbreid_tpu.constants import BN_FOREGROUND

    model = BPBreID(num_classes=8, parts_num=5, backbone='hrnet32',
                    last_stride=1, dim_reduce='after_pooling',
                    dim_reduce_output=64)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 64, 32, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    emb_f, vis_f, *_ = model.apply(v, x, train=False)
    with int8_calibration():
        _, qvars = model.apply(v, x, train=False, mutable=['quant'])
    # per-conv scales, per-channel granularity (the conservative mode)
    with int8_inference(shared=False, act_granularity='per_channel'):
        emb_q, vis_q, *_ = model.apply({**v, **qvars}, x, train=False)
    f = np.asarray(emb_f[BN_FOREGROUND], np.float32)
    q = np.asarray(emb_q[BN_FOREGROUND], np.float32)
    cos = (f * q).sum(-1) / (np.linalg.norm(f, axis=-1)
                             * np.linalg.norm(q, axis=-1) + 1e-9)
    assert cos.min() > 0.995, cos
    np.testing.assert_array_equal(np.asarray(vis_f['parts']),
                                  np.asarray(vis_q['parts']))

    # shared quantization points + per-tensor act scales (the DEFAULT
    # mode of a bare int8_inference(), matching cfg.test defaults — the
    # round-5 A/B winner): one s8 copy per block, produced in the
    # block's output fusion (models/common.py quant_out); slightly
    # looser bound, the residual trunk rides int8
    with int8_inference():
        emb_s, vis_s, *_ = model.apply({**v, **qvars}, x, train=False)
    s = np.asarray(emb_s[BN_FOREGROUND], np.float32)
    cos_s = (f * s).sum(-1) / (np.linalg.norm(f, axis=-1)
                               * np.linalg.norm(s, axis=-1) + 1e-9)
    assert cos_s.min() > 0.99, cos_s
    np.testing.assert_array_equal(np.asarray(vis_f['parts']),
                                  np.asarray(vis_s['parts']))


def test_act_scale_granularities():
    """act_scale_from_amax under the three granularities: per-channel
    passthrough, per-tensor collapse, and per_channel_floor<K> (floors
    each channel's amax at max/K — bounds the weight-fold dynamic range
    that otherwise destroys per-output-channel weight quantization, see
    the round-5 accuracy A/B in MODEL_ZOO.md)."""
    from bpbreid_tpu.ops.quant import act_scale_from_amax, int8_inference
    amax = jnp.asarray([160.0, 1.0, 0.0, 40.0])
    with int8_inference(act_granularity='per_channel'):
        np.testing.assert_allclose(act_scale_from_amax(amax),
                                   amax / 127.0)
        # scalar amax (module-level shared point): granularity-agnostic
        assert float(act_scale_from_amax(jnp.asarray(2.54))) == \
            pytest.approx(0.02)
    with int8_inference(act_granularity='per_tensor'):
        s = act_scale_from_amax(amax)
        assert s.ndim == 0 and float(s) == pytest.approx(160.0 / 127.0)
    with int8_inference(act_granularity='per_channel_floor16'):
        np.testing.assert_allclose(
            act_scale_from_amax(amax),
            np.maximum(np.asarray(amax), 160.0 / 16.0) / 127.0)
