"""Checkpoint round-trip tests (reference: sidecar flute_config.json +
extra-state persistence, base.py:310-326, 356-367)."""

import json
import os

import jax.numpy as jnp
import numpy as np

from flute_tpu.integrations import checkpoint as ckpt_io
from flute_tpu.models import llama
from flute_tpu.nn import QuantizedLinear
import pytest


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path):
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    qparams = llama.quantize_model(params, num_bits=3, group_size=64, chunk=128)

    path = str(tmp_path / "ckpt")
    ckpt_io.save_quantized(path, qparams, num_bits=3, group_size=64)
    assert os.path.exists(os.path.join(path, "flute_config.json"))
    with open(os.path.join(path, "flute_config.json")) as f:
        sidecar = json.load(f)
    assert sidecar["num_bits"] == 3 and sidecar["group_size"] == 64

    loaded, sidecar2 = ckpt_io.load_quantized(path)
    assert sidecar2["num_bits"] == 3

    # structure: layers back as a list, quantized leaves restored
    assert isinstance(loaded["layers"], list)
    q0 = loaded["layers"][0]["q"]
    assert isinstance(q0, QuantizedLinear)
    assert q0.num_bits == 3 and q0.config_key == qparams["layers"][0]["q"].config_key

    # bit-exact tensors
    for a, b in zip(qparams["layers"][0]["q"].planes, q0.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(qparams["embed"], np.float32), np.asarray(loaded["embed"], np.float32)
    )

    # forward equality
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    cache_a = llama.init_cache(config, 1, 8)
    cache_b = llama.init_cache(config, 1, 8)
    la, _ = llama.forward(qparams, config, tokens, cache_a, jnp.int32(0))
    lb, _ = llama.forward(loaded, config, tokens, cache_b, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
