"""Paged KV cache tests: kernel vs dense oracle, engine parity with the
dense-cache Engine, block accounting, and pool-pressure queueing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu.models import llama
from flute_tpu.ops.paged_attention import (
    paged_decode_attention,
    paged_gqa_reference,
)
from flute_tpu.serving import Engine
from flute_tpu.serving.paged import PagedEngine


@pytest.mark.parametrize("hkv,h", [(2, 8), (4, 4)])  # GQA and MHA
def test_kernel_matches_reference(hkv, h):
    rng = np.random.default_rng(0)
    B, D, BS, MB, NB = 3, 128, 16, 4, 16
    q = jnp.asarray(rng.standard_normal((B, h, D)), jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((NB, hkv, BS, D)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((NB, hkv, BS, D)), jnp.bfloat16)
    tables = jnp.asarray(
        rng.permutation(NB)[: B * MB].reshape(B, MB), jnp.int32
    )
    # unaligned, block-aligned, and full lengths
    lengths = jnp.asarray([37, 16, 64], jnp.int32)
    want = paged_gqa_reference(q, kp, vp, tables, lengths)
    got = paged_decode_attention(q, kp, vp, tables, lengths, interpret=True)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    denom = max(np.abs(np.asarray(want, np.float32)).max(), 1e-6)
    assert err.max() / denom < 1.1e-2


def test_kernel_zero_length_slot_is_finite():
    """A parked slot (length 0, trash table) must produce finite output."""
    rng = np.random.default_rng(1)
    B, h, hkv, D, BS, MB, NB = 2, 4, 2, 128, 16, 2, 4
    q = jnp.asarray(rng.standard_normal((B, h, D)), jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((NB, hkv, BS, D)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((NB, hkv, BS, D)), jnp.bfloat16)
    tables = jnp.zeros((B, MB), jnp.int32)
    lengths = jnp.asarray([0, 5], jnp.int32)
    got = np.asarray(
        paged_decode_attention(q, kp, vp, tables, lengths, interpret=True),
        np.float32,
    )
    assert np.isfinite(got).all()


@pytest.fixture(scope="module")
def tiny_q():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    return config, llama.quantize_model(params, num_bits=4, group_size=64)


def test_paged_engine_matches_dense_engine(tiny_q):
    """Greedy outputs through the paged pool equal the dense-cache Engine
    (same model, same prompts) and all blocks return to the free list."""
    config, qparams = tiny_q
    prompts = [[3, 17, 42, 9], [11, 5], [7, 7, 2, 19, 4]]
    n = 8
    dense = Engine(params=qparams, config=config, max_len=64,
                   batch_size=len(prompts))
    want = dense.generate(prompts, max_new_tokens=n)

    eng = PagedEngine(
        params=qparams, config=config, num_slots=3,
        block_size=8, num_blocks=12, max_len=32,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want
    assert eng.blocks_in_use == 0


@pytest.mark.slow
def test_pool_pressure_queues_and_completes(tiny_q):
    """More requests than the pool can hold at once: later requests wait
    for blocks and still complete correctly."""
    config, qparams = tiny_q
    prompts = [[i + 1, i + 5, i + 9] for i in range(5)]
    n = 6
    dense = Engine(params=qparams, config=config, max_len=64, batch_size=5)
    want = dense.generate(prompts, max_new_tokens=n)

    # 2 blocks/request (3 + 6 + 1 = 10 tokens, block 8) and only 5 usable
    # blocks -> at most 2 concurrent requests
    eng = PagedEngine(
        params=qparams, config=config, num_slots=4,
        block_size=8, num_blocks=6, max_len=24,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want
    assert eng.blocks_in_use == 0


def test_submit_guards(tiny_q):
    config, qparams = tiny_q
    eng = PagedEngine(
        params=qparams, config=config, num_slots=1,
        block_size=8, num_blocks=4, max_len=16,
    )
    with pytest.raises(ValueError):
        eng.submit(list(range(12)), max_new_tokens=8)  # > max_len
