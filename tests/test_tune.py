"""Tuner tests (reference flute/tune.py semantics): memoization, metadata
persistence, retune-on-mismatch, and the post-tune correctness oracles."""

import jax.numpy as jnp
import numpy as np

from flute_tpu import nn as fnn
from flute_tpu import tune
from flute_tpu.ops.kernel_config import KernelConfig


def test_tune_config_cpu_heuristic_and_memo():
    cfg = tune.tune_config(8, 1024, 512, 4, 64)
    assert isinstance(cfg, KernelConfig)
    # memoized: same key (m below 16 rounds up like the reference's max(M,16))
    cfg2 = tune.tune_config(3, 1024, 512, 4, 64)
    assert cfg2.key() == cfg.key()


def test_verify_config_passes_for_default():
    cfg = tune.tune_config(16, 512, 512, 4, 64)
    tune.verify_config(cfg, n=512, k=512, num_bits=4, group_size=64, seeds=(0,))


def test_metadata_roundtrip_and_maybe_retune():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32)
    layer = fnn.quantize_linear(w, num_bits=4, group_size=64)
    meta = tune.metadata_for(layer, m=8)
    meta2 = tune.TuneMetaData.from_json(meta.to_json())
    assert meta2 == meta

    # same deployment -> stored config restored verbatim
    same = tune.maybe_retune(layer, meta, m=8)
    assert same.config_key == meta.config_key

    # changed batch size -> retuned (CPU: heuristic, still a valid config)
    retuned = tune.maybe_retune(layer, meta, m=256)
    assert retuned.config is not None
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(layer(x), np.float32), np.asarray(retuned(x), np.float32)
    )


def test_registry_save_load(tmp_path):
    tune.tune_config(8, 1024, 512, 4, 64)
    path = str(tmp_path / "reg.json")
    tune.save_registry(path)
    tune._MEMO.clear()
    n = tune.load_registry(path)
    assert n >= 1
    # loaded entry short-circuits tuning
    cfg = tune.tune_config(8, 1024, 512, 4, 64)
    assert isinstance(cfg, KernelConfig)
