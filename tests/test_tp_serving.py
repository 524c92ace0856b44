"""Tensor-parallel serving: fused layouts under TP and TP-composed engines.

The reference serves TP through vLLM with fused-partition shard metadata
(flute/integrations/vllm_utils.py:119-226, :265-326). Here the equivalent
is a rank-major column permutation of the fused packed weights (exact, no
unpack) plus shard_map engines — tested end-to-end on the simulated
8-device CPU mesh, which the reference cannot do at all (SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu import nn as fnn
from flute_tpu.models import llama
from flute_tpu.parallel import (
    fused_member_widths,
    llama_partition_specs,
    make_mesh,
    permute_fused_linear,
    permute_fused_params,
    shard_params,
    tp_model_forward,
    validate_tp,
)
from flute_tpu.serving import ContinuousBatchingEngine, Engine

BF16_RTOL = 1.1e-2


@pytest.fixture(scope="module")
def tiny_fused():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    qparams = llama.quantize_model(params, 4, 64, chunk=128, fuse=True)
    return config, qparams


def test_permute_fused_linear_is_column_permutation():
    """The packed-plane permutation must equal permuting the dequantized
    dense columns (pack layout is independent per N column)."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((512, 256)), jnp.float32)  # [out, in]
    layer = fnn.quantize_linear(w, num_bits=4, group_size=64, chunk=128)
    widths = (256, 128, 128)
    tp = 2
    perm = permute_fused_linear(layer, widths, tp)
    dense = np.asarray(layer.dequantize(), np.float32)  # [in, out]
    offs = np.concatenate([[0], np.cumsum(widths)])
    idx = np.concatenate(
        [
            np.arange(offs[m] + r * (wd // tp), offs[m] + (r + 1) * (wd // tp))
            for r in range(tp)
            for m, wd in enumerate(widths)
        ]
    )
    np.testing.assert_array_equal(
        np.asarray(perm.dequantize(), np.float32), dense[:, idx]
    )


def test_tp_fused_forward_matches_single_device(tiny_fused):
    config, qparams = tiny_fused
    validate_tp(qparams, config, tp=2)
    mesh = make_mesh(tp=2, dp=1)
    pparams = permute_fused_params(qparams, config, tp=2)
    specs = llama_partition_specs(pparams)
    sharded = shard_params(pparams, mesh, specs)

    b, t, s = 2, 6, 16
    tokens = jnp.asarray(
        np.random.default_rng(3).integers(0, 100, (b, t)), jnp.int32
    )
    cache = llama.init_cache(config, b, s)
    fwd = tp_model_forward(config, mesh, specs)
    logits_tp, cache_tp = jax.jit(
        lambda p, tk, c: fwd(p, config, tk, c, jnp.int32(0))
    )(sharded, tokens, cache)

    cache1 = llama.init_cache(config, b, s)
    logits_1, _ = llama.forward(qparams, config, tokens, cache1, jnp.int32(0))

    lt, l1 = np.asarray(logits_tp), np.asarray(logits_1)
    denom = max(np.abs(l1).max(), 1e-6)
    assert np.abs(lt - l1).max() / denom < BF16_RTOL


@pytest.mark.slow
def test_engine_tp_fused_matches_single_device(tiny_fused):
    config, qparams = tiny_fused
    prompts = [[5, 9, 2, 7], [11, 3]]

    eng1 = Engine(params=qparams, config=config, max_len=64, batch_size=2)
    out1 = eng1.generate(prompts, max_new_tokens=8)

    mesh = make_mesh(tp=2, dp=1)
    pparams = permute_fused_params(qparams, config, tp=2)
    eng_tp = Engine(
        params=pparams, config=config, max_len=64, batch_size=2, mesh=mesh
    )
    out_tp = eng_tp.generate(prompts, max_new_tokens=8)
    assert out1 == out_tp


@pytest.mark.slow
def test_continuous_engine_tp_fused(tiny_fused):
    config, qparams = tiny_fused
    reqs = [([5, 9, 2, 7], 6), ([11, 3], 5), ([1, 2, 3], 4)]

    eng1 = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=4, max_len=64
    )
    rids1 = [eng1.submit(p, max_new_tokens=m) for p, m in reqs]
    out1 = eng1.run()

    mesh = make_mesh(tp=2, dp=1)
    pparams = permute_fused_params(qparams, config, tp=2)
    eng_tp = ContinuousBatchingEngine(
        params=pparams, config=config, num_slots=4, max_len=64, mesh=mesh
    )
    rids_tp = [eng_tp.submit(p, max_new_tokens=m) for p, m in reqs]
    out_tp = eng_tp.run()

    for r1, r2 in zip(rids1, rids_tp):
        assert out1[r1] == out_tp[r2]


def test_fused_member_widths(tiny_fused):
    config, _ = tiny_fused
    d = config.head_dim
    assert fused_member_widths(config, "qkv") == (
        config.num_heads * d, config.num_kv_heads * d, config.num_kv_heads * d
    )
    assert fused_member_widths(config, "gate_up") == (
        config.intermediate_size, config.intermediate_size
    )


@pytest.mark.slow
def test_paged_engine_tp_fused_matches_single_device(tiny_fused):
    """PagedEngine under a tp=2 mesh (pools sharded over KV heads, fused
    layouts rank-major permuted) reproduces the single-device paged
    stream — vLLM's PagedAttention+TP composition, on the CPU mesh."""
    from flute_tpu.serving.paged import PagedEngine

    config, qparams = tiny_fused
    # the first two share an 8-token (one-block) prefix: with the pool
    # prefix cache on, the second request splices a shared block under
    # TP (head-sharded pool rows into the prefill scratch)
    system = list(range(1, 9))
    reqs = [(system + [5, 9], 6), (system + [11], 5), ([7, 3], 4)]

    def run(engine):
        rids = [engine.submit(p, max_new_tokens=m) for p, m in reqs]
        out = engine.run()
        return [out[r] for r in rids]

    eng1 = PagedEngine(
        params=qparams, config=config, num_slots=1,
        block_size=8, num_blocks=10, max_len=32, prefix_cache_blocks=2,
    )
    out1 = run(eng1)

    mesh = make_mesh(tp=2, dp=1)
    pparams = permute_fused_params(qparams, config, tp=2)
    eng_tp = PagedEngine(
        params=pparams, config=config, num_slots=1,
        block_size=8, num_blocks=10, max_len=32, prefix_cache_blocks=2,
        mesh=mesh,
    )
    out_tp = run(eng_tp)

    assert out1 == out_tp
    assert eng_tp.prefix_hits == eng1.prefix_hits == 1
    assert eng_tp.blocks_in_use == 0


@pytest.mark.slow
def test_paged_engine_tp_gemma2_matches_single_device():
    """Gemma-2 through the paged pool under tp=2: the softcap/sliding-
    window kernel variants run per-rank on local head shards."""
    from flute_tpu.models import gemma2
    from flute_tpu.serving.paged import PagedEngine

    config = gemma2.Gemma2Config.tiny()
    params = gemma2.init_params(config, rng=0)
    qparams = gemma2.quantize_model(params, num_bits=4, group_size=64)
    prompts = [[3, 17, 42, 9], [11, 5, 8]]
    n = 6

    eng1 = PagedEngine(
        params=qparams, config=config, num_slots=2,
        block_size=8, num_blocks=10, max_len=32,
    )
    rids1 = [eng1.submit(p, max_new_tokens=n) for p in prompts]
    out1 = eng1.run()

    mesh = make_mesh(tp=2, dp=1)
    eng_tp = PagedEngine(
        params=qparams, config=config, num_slots=2,
        block_size=8, num_blocks=10, max_len=32, mesh=mesh,
    )
    rids_tp = [eng_tp.submit(p, max_new_tokens=n) for p in prompts]
    out_tp = eng_tp.run()
    for r1, r2 in zip(rids1, rids_tp):
        assert out1[r1] == out_tp[r2]


@pytest.mark.slow
def test_paged_speculative_tp_matches_single_device(tiny_fused):
    """PagedSpeculativeEngine under a tp=2 mesh (pools AND draft cache
    sharded over KV heads, fused layouts rank-major permuted on both
    sides, verify + draft steps shard_map'd) reproduces the
    single-device speculative stream — greedy and sampled slots in one
    batch, bonus tokens flowing on both."""
    from flute_tpu.serving.paged_spec import PagedSpeculativeEngine

    config, qparams = tiny_fused
    reqs = [([3, 17, 42, 9], 8, {}),
            ([11, 5], 8, dict(temperature=0.9, top_k=40, seed=123))]

    def run(engine):
        rids = [engine.submit(p, max_new_tokens=m, **kw)
                for p, m, kw in reqs]
        out = engine.run()
        return [out[r] for r in rids]

    eng1 = PagedSpeculativeEngine(
        params=qparams, config=config,
        draft_params=qparams, draft_config=config,
        k=3, num_slots=2, block_size=8, num_blocks=12, max_len=32,
    )
    out1 = run(eng1)
    assert eng1.stats.bonus > 0  # self-draft: bonus path exercised

    mesh = make_mesh(tp=2, dp=1)
    pparams = permute_fused_params(qparams, config, tp=2)
    eng_tp = PagedSpeculativeEngine(
        params=pparams, config=config,
        draft_params=pparams, draft_config=config,
        k=3, num_slots=2, block_size=8, num_blocks=12, max_len=32,
        mesh=mesh,
    )
    out_tp = run(eng_tp)

    assert out1 == out_tp
    assert eng_tp.blocks_in_use == 0


@pytest.mark.slow
def test_pool_prefill_tp_matches_single_device(tiny_fused):
    """pool_prefill under tp=2: the shared multi-token paged forward
    (chunked, straight into head-sharded pool blocks) runs under
    shard_map and reproduces the single-device stream."""
    from flute_tpu.serving.paged import PagedEngine

    config, qparams = tiny_fused
    prompts = [[3, 17, 42, 9], [11, 5, 8, 1, 13, 2, 7]]
    n = 8

    def run(engine):
        rids = [engine.submit(p, max_new_tokens=n) for p in prompts]
        out = engine.run()
        return [out[r] for r in rids]

    eng1 = PagedEngine(
        params=qparams, config=config, num_slots=2, block_size=8,
        num_blocks=12, max_len=32, pool_prefill=True, prefill_chunk=4,
    )
    out1 = run(eng1)

    mesh = make_mesh(tp=2, dp=1)
    pparams = permute_fused_params(qparams, config, tp=2)
    eng_tp = PagedEngine(
        params=pparams, config=config, num_slots=2, block_size=8,
        num_blocks=12, max_len=32, pool_prefill=True, prefill_chunk=4,
        mesh=mesh,
    )
    assert run(eng_tp) == out1
    assert eng_tp.blocks_in_use == 0
