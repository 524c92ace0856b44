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


def test_pick_verified_rejects_failing_candidate():
    """A mis-compiling fastest candidate must be skipped in favor of the
    next-fastest verified one (reference tune.py:294-392 re-verifies every
    chosen template)."""
    from flute_tpu.tune import pick_verified

    a = KernelConfig(block_n=256, block_k=256)
    b = KernelConfig(block_n=512, block_k=512)
    c = KernelConfig(block_n=1024, block_k=1024)
    timed = [(3.0, c), (1.0, a), (2.0, b)]

    best, t = pick_verified(timed, lambda cfg: cfg is not a)
    assert best is b and t == 2.0

    best, t = pick_verified(timed, lambda cfg: cfg is a)
    assert best is a and t == 1.0

    def raises(cfg):
        raise RuntimeError("boom")

    best, t = pick_verified(timed, raises)
    assert best is None


def test_host_oracle_matches_reference():
    from flute_tpu.ops import lut_gemm
    from flute_tpu.tune import _host_oracle

    rng = np.random.default_rng(0)
    k, n, g, bits = 256, 128, 64, 4
    codes = rng.integers(0, 16, (k, n), dtype=np.int32)
    scales = rng.uniform(0.5, 1.5, (k // g, n)).astype(np.float32)
    table = np.sort(rng.standard_normal(16)).astype(np.float32)
    x = rng.standard_normal((8, k)).astype(np.float32)
    want = _host_oracle(x, codes, scales, table, jnp.bfloat16)
    ref = np.asarray(
        lut_gemm.lut_qgemm_reference(
            jnp.asarray(x, jnp.bfloat16),
            jnp.asarray(codes),
            jnp.asarray(scales, jnp.bfloat16),
            jnp.asarray(table),
        ),
        np.float32,
    )
    denom = np.abs(ref).max()
    assert np.abs(want - ref).max() / denom < 1.1e-2
