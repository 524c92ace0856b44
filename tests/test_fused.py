"""Fused qkv/gate_up projection tests: fused and unfused quantized models
must produce matching outputs (same codes, same kernel — only the launch
granularity differs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu.models import llama
from flute_tpu.parallel import validate_tp


@pytest.fixture(scope="module")
def tiny():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    return config, params


@pytest.mark.slow
def test_fused_matches_unfused(tiny):
    config, params = tiny
    q_unfused = llama.quantize_model(params, 4, 64, chunk=128)
    q_fused = llama.quantize_model(params, 4, 64, chunk=128, fuse=True)
    assert "qkv" in q_fused["layers"][0] and "q" not in q_fused["layers"][0]

    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 100, (2, 6)), jnp.int32)
    c1 = llama.init_cache(config, 2, 12)
    c2 = llama.init_cache(config, 2, 12)
    l1, _ = llama.forward(q_unfused, config, tokens, c1, jnp.int32(0))
    l2, _ = llama.forward(q_fused, config, tokens, c2, jnp.int32(0))
    # same quantization codes; scale groups run along K so fusion along N
    # changes nothing about per-group absmax -> outputs agree to bf16 noise
    denom = max(np.abs(np.asarray(l1)).max(), 1e-6)
    assert np.abs(np.asarray(l1) - np.asarray(l2)).max() / denom < 1.1e-2


def test_fused_tp_validation(tiny):
    """Fused layers are TP-shardable (via rank-major column permutation)
    when every member's per-rank slice stays 128-lane aligned."""
    config, params = tiny
    q_fused = llama.quantize_model(params, 4, 64, chunk=128, fuse=True)
    validate_tp(q_fused, config, tp=2)  # kv slice = 128 columns: ok
    import dataclasses

    # head_dim=64 would make the kv member 128 wide -> 64-column slices at
    # tp=2: below lane width, must be rejected before any sharding happens
    narrow = dataclasses.replace(config, head_dim=64)
    with pytest.raises(ValueError, match="128-column"):
        validate_tp(q_fused, narrow, tp=2)
