"""Perplexity evaluation harness tests."""

import numpy as np
import pytest

from flute_tpu import eval as fte
from flute_tpu.models import llama


@pytest.mark.slow
def test_perplexity_runs_and_quantization_is_close():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    qparams = llama.quantize_model(params, num_bits=4, group_size=64)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, config.vocab_size, 3 * 32).astype(np.int32)

    ppl_dense = fte.perplexity(params, config, toks, seq_len=32)
    ppl_q = fte.perplexity(qparams, config, toks, seq_len=32)
    assert np.isfinite(ppl_dense) and ppl_dense > 1
    # W4G64 on a random tiny model: PPLs must agree closely (reference
    # quality contract: quantization barely moves PPL, README.md:143-152)
    assert abs(ppl_q - ppl_dense) / ppl_dense < 0.05


@pytest.mark.slow
def test_perplexity_batched_matches_unbatched():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=1)
    toks = np.random.default_rng(1).integers(0, 100, 4 * 16).astype(np.int32)
    p1 = fte.perplexity(params, config, toks, seq_len=16, batch_size=1)
    p2 = fte.perplexity(params, config, toks, seq_len=16, batch_size=3)
    assert abs(p1 - p2) / p1 < 1e-3
