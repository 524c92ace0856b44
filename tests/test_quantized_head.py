"""Quantized-lm-head option (beyond reference parity)."""

import jax.numpy as jnp
import numpy as np

from flute_tpu.models import gemma2, llama
from flute_tpu.nn import QuantizedLinear


def test_quantized_lm_head_logits_close():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    q1 = llama.quantize_model(params, 4, 64, chunk=128)
    q2 = llama.quantize_model(params, 4, 64, chunk=128, quantize_lm_head=True)
    assert isinstance(q2["lm_head"], QuantizedLinear)
    assert not isinstance(q1["lm_head"], QuantizedLinear)

    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    c1 = llama.init_cache(config, 1, 8)
    c2 = llama.init_cache(config, 1, 8)
    l1, _ = llama.forward(q1, config, tokens, c1, jnp.int32(0))
    l2, _ = llama.forward(q2, config, tokens, c2, jnp.int32(0))
    # the head itself is now NF4-quantized, so logits differ by genuine
    # W4G64 quantization error (~5-10% worst-case on random weights);
    # check the error is bounded and rankings survive
    # (a random tiny model has near-tied logits, so rank-stability is not a
    # sound oracle here; PPL-level quality is covered by test_eval)
    a1, a2 = np.asarray(l1), np.asarray(l2)
    denom = max(np.abs(a1).max(), 1e-6)
    assert np.abs(a1 - a2).max() / denom < 0.15


def test_gemma2_quantized_tied_head():
    """Gemma-2 ties lm_head to the embedding; quantize_lm_head quantizes a
    transposed copy while the dense embed keeps serving input lookups."""
    config = gemma2.Gemma2Config.tiny()
    params = gemma2.init_params(config, rng=0)
    q1 = gemma2.quantize_model(params, 4, 64, chunk=128)
    q2 = gemma2.quantize_model(params, 4, 64, chunk=128, quantize_lm_head=True)
    assert "lm_head" not in q1
    assert isinstance(q2["lm_head"], QuantizedLinear)
    # padded out to a 2048-multiple of out-features
    assert q2["lm_head"].scales.shape[1] % 2048 == 0

    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    c1 = gemma2.init_cache(config, 1, 8)
    c2 = gemma2.init_cache(config, 1, 8)
    l1, _ = gemma2.forward(q1, config, tokens, c1, jnp.int32(0))
    l2, _ = gemma2.forward(q2, config, tokens, c2, jnp.int32(0))
    assert l1.shape == l2.shape == (1, 4, config.vocab_size)
    a1, a2 = np.asarray(l1), np.asarray(l2)
    denom = max(np.abs(a1).max(), 1e-6)
    # final-logit softcap compresses the range, so quantization error on the
    # head shows up attenuated vs the llama case
    assert np.abs(a1 - a2).max() / denom < 0.15
