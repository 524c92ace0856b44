"""Model-level integration tests (role of the reference's tests/vllm.py
layer-wise + generation checks, tests/vllm.py:57-145): a fake-quantized
dense model and the real LUT-quantized model must agree, and generation
must be stable across batch layouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu import nn as fnn
from flute_tpu.models import llama
from flute_tpu.quantize import nf
from flute_tpu.serving import Engine, greedy_generate
from flute_tpu.serving.engine import greedy_generate_fused

BF16_RTOL = 1.1e-2  # reference threshold, tests/kernel.py:13


@pytest.fixture(scope="module")
def tiny():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    return config, params


def _fake_quant_params(params, num_bits, group_size):
    """Dense params whose projections hold kernel-faithful fake-quant values
    (the reference's prepare_model_flute(fake=True) oracle, base.py:85-102)."""
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new_layer = dict(layer)
        for key in llama._PROJ_KEYS:
            w = jnp.asarray(layer[key]).T  # [out, in]
            # production 4-bit uses the sign-symmetric NF grid (w4sym layout)
            fq = nf.nf_quantize_fake(
                w, num_bits, group_size, jnp.bfloat16,
                symmetric=(num_bits == 4),
            )
            new_layer[key] = fq.T  # back to [in, out]
        out["layers"].append(new_layer)
    return out


def test_quantized_model_matches_fake_quant(tiny):
    config, params = tiny
    qparams = llama.quantize_model(params, num_bits=4, group_size=64)
    fparams = _fake_quant_params(params, 4, 64)

    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 100, (2, 8)), jnp.int32)
    cache_q = llama.init_cache(config, 2, 16)
    cache_f = llama.init_cache(config, 2, 16)
    logits_q, _ = llama.forward(qparams, config, tokens, cache_q, jnp.int32(0))
    logits_f, _ = llama.forward(fparams, config, tokens, cache_f, jnp.int32(0))

    lq, lf = np.asarray(logits_q), np.asarray(logits_f)
    denom = np.maximum(np.abs(lf).max(), 1e-6)
    assert np.abs(lq - lf).max() / denom < BF16_RTOL


def test_quantized_linear_dequantize_is_exact():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)  # [out, in]
    layer = fnn.quantize_linear(w, num_bits=4, group_size=64)
    # dequantize() and the identity-input kernel reconstruction must agree
    # bit-exactly (reference contract, flute/utils.py:347-376).
    from flute_tpu import packing

    deq = layer.dequantize(jnp.bfloat16)
    recon = packing.reconstruct(
        list(layer.planes), layer.scales, layer.table, 4, layout=layer.layout
    )
    np.testing.assert_array_equal(
        np.asarray(deq, np.float32), np.asarray(recon, np.float32)
    )


def test_quantized_linear_forward_matches_dense():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
    layer = fnn.quantize_linear(w, num_bits=4, group_size=64)
    x = jnp.asarray(rng.standard_normal((3, 256)), jnp.bfloat16)
    y = layer(x)
    y_ref = jnp.dot(
        x, layer.dequantize(jnp.bfloat16), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=0, atol=BF16_RTOL * float(jnp.abs(y_ref).max()),
    )


@pytest.mark.slow
def test_greedy_generation_deterministic(tiny):
    config, params = tiny
    qparams = llama.quantize_model(params, num_bits=4, group_size=64)
    prompts = [[1, 5, 9, 13], [2, 6, 10, 14]]
    out1 = greedy_generate(qparams, config, prompts, max_new_tokens=6, max_len=32)
    out2 = greedy_generate(qparams, config, prompts, max_new_tokens=6, max_len=32)
    assert out1 == out2
    assert all(len(o) == 6 for o in out1)


def test_ragged_batch_matches_single(tiny):
    """Left-padded ragged batching must reproduce each prompt's solo
    generation exactly (positions and masking both correct)."""
    config, params = tiny
    long_p = [3, 7, 11, 15, 19, 23]
    short_p = [4, 8]
    batched = greedy_generate(
        params, config, [long_p, short_p], max_new_tokens=5, max_len=32
    )
    solo_long = greedy_generate(params, config, [long_p], max_new_tokens=5, max_len=32)
    solo_short = greedy_generate(params, config, [short_p], max_new_tokens=5, max_len=32)
    assert batched[0] == solo_long[0]
    assert batched[1] == solo_short[0]


def test_fused_generation_matches_engine(tiny):
    config, params = tiny
    prompts = np.random.default_rng(4).integers(1, 100, (2, 6)).tolist()
    eng_out = greedy_generate(params, config, prompts, max_new_tokens=5, max_len=32)
    fused = greedy_generate_fused(
        params, config, jnp.asarray(prompts, jnp.int32), 5, max_len=32
    )
    assert np.asarray(fused).tolist() == eng_out


def test_pytree_roundtrip():
    """QuantizedLinear must be a well-formed pytree: flatten/unflatten and
    jit-through both preserve it."""
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
    layer = fnn.quantize_linear(w, num_bits=4, group_size=64)
    leaves, treedef = jax.tree_util.tree_flatten(layer)
    layer2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert layer2.num_bits == 4 and layer2.config_key == layer.config_key

    x = jnp.asarray(rng.standard_normal((3, 256)), jnp.bfloat16)
    y1 = layer(x)
    y2 = jax.jit(lambda l, xx: l(xx))(layer, x)
    np.testing.assert_array_equal(
        np.asarray(y1, np.float32), np.asarray(y2, np.float32)
    )


def test_w3_wide_model_matches_fake_quant(tiny):
    """Full-model forward through the wide 3-bit kernel path (the r2
    default layout) must match kernel-faithful fake quantization."""
    config, params = tiny
    qparams = llama.quantize_model(params, num_bits=3, group_size=64)
    # confirm the wide layout is actually in play
    assert len(qparams["layers"][0]["q"].planes) == 1
    fparams = _fake_quant_params(params, 3, 64)
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    cq = llama.init_cache(config, 1, 8)
    cf = llama.init_cache(config, 1, 8)
    lq, _ = llama.forward(qparams, config, tokens, cq, jnp.int32(0))
    lf, _ = llama.forward(fparams, config, tokens, cf, jnp.int32(0))
    denom = max(np.abs(np.asarray(lf)).max(), 1e-6)
    assert np.abs(np.asarray(lq) - np.asarray(lf)).max() / denom < BF16_RTOL
