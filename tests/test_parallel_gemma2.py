"""Gemma-2 under tensor parallelism: the TP machinery is model-agnostic
(projection-name based specs); verify it against the second model family."""

import jax.numpy as jnp
import numpy as np

from flute_tpu.models import gemma2
from flute_tpu.parallel import (
    llama_partition_specs,
    make_mesh,
    shard_params,
    tp_forward_fn,
)

BF16_RTOL = 1.1e-2


def test_gemma2_tp_forward_matches_single_device():
    config = gemma2.Gemma2Config.tiny()
    params = gemma2.init_params(config, rng=0)
    qparams = gemma2.quantize_model(params, num_bits=4, group_size=64, chunk=128)

    mesh = make_mesh(tp=2, dp=2)
    specs = llama_partition_specs(qparams)
    sharded = shard_params(qparams, mesh, specs)

    b, t, s = 4, 6, 12
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 100, (b, t)), jnp.int32)
    offsets = jnp.zeros((b,), jnp.int32)
    cache = gemma2.init_cache(config, b, s)

    step = tp_forward_fn(config, mesh, specs, forward=gemma2.forward)
    logits_tp, _ = step(sharded, tokens, cache, 0, offsets)

    logits_1, _ = gemma2.forward(qparams, config, tokens, cache, jnp.int32(0))
    lt, l1 = np.asarray(logits_tp), np.asarray(logits_1)
    denom = max(np.abs(l1).max(), 1e-6)
    assert np.abs(lt - l1).max() / denom < BF16_RTOL
