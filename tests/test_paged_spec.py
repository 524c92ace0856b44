"""Paged speculative decoding tests (PagedSpeculativeEngine).

Invariants inherited from both parents:
  * output == the target's plain decode, regardless of the draft
    (greedy: argmax match; sampled: the modified-rejection kernel is
    distribution-exact AND — because keys are (request seed, tokens
    generated) — bit-identical to the plain engines when draft == target);
  * block accounting: every pool block returns to the free list;
  * the verify round's k-ahead junk writes stay inside the request's own
    reserved blocks (admission reserves blocks for plen + budget + k + 1).

Oracles: the dense-cache Engine (greedy) and the plain PagedEngine
(sampled, same (seed, count) keys). Seeds follow the round-1 lesson on
greedy-equality oracles: argmax must be stable across T=1 / T=k+1
forward shapes — don't change them casually.
"""

import numpy as np
import pytest

from flute_tpu.models import llama
from flute_tpu.serving import Engine
from flute_tpu.serving.paged import PagedEngine
from flute_tpu.serving.paged_spec import PagedSpeculativeEngine


@pytest.fixture(scope="module")
def tiny_pair():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    target = llama.quantize_model(params, num_bits=4, group_size=64)
    draft_params = llama.init_params(config, rng=7)  # worst-case drafter
    draft = llama.quantize_model(draft_params, num_bits=4, group_size=64)
    return config, target, draft


def _greedy_oracle(config, qparams, prompts, n):
    eng = Engine(params=qparams, config=config, max_len=96,
                 batch_size=len(prompts))
    return eng.generate(prompts, max_new_tokens=n)


@pytest.mark.slow
def test_self_draft_matches_greedy_with_bonus(tiny_pair):
    """Draft == target: output equals plain greedy decode, every round
    fully accepts, so tokens arrive k+1 per round (bonus flowing) and all
    pool blocks return."""
    config, target, _ = tiny_pair
    prompts = [[3, 17, 42, 9], [11, 5]]
    n = 8
    want = _greedy_oracle(config, target, prompts, n)
    eng = PagedSpeculativeEngine(
        params=target, config=config,
        draft_params=target, draft_config=config,
        k=3, num_slots=2, block_size=8, num_blocks=16, max_len=64,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want
    assert eng.stats.bonus > 0
    assert eng.stats.rounds <= -(-n // (eng.k + 1)) + 1
    assert eng.blocks_in_use == 0


@pytest.mark.slow
def test_independent_draft_greedy_parity(tiny_pair):
    """A mismatching draft changes speed, never output."""
    config, target, draft = tiny_pair
    prompts = [[3, 17, 42, 9], [11, 5]]
    n = 10
    want = _greedy_oracle(config, target, prompts, n)
    eng = PagedSpeculativeEngine(
        params=target, config=config,
        draft_params=draft, draft_config=config,
        k=3, num_slots=2, block_size=8, num_blocks=16, max_len=64,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want
    assert eng.stats.acceptance_rate < 1.0  # rejections actually exercised
    assert eng.blocks_in_use == 0


@pytest.mark.slow
def test_sampled_bit_identity_and_mixed_batch(tiny_pair):
    """Draft == target, temperature > 0: the speculative stream is
    bit-identical to the plain PagedEngine's sampled stream (same seeds,
    same (seed, count) keys — acceptance is always u < 1). A mixed
    greedy + sampled batch reproduces both oracles simultaneously."""
    config, target, _ = tiny_pair
    prompts = [[3, 17, 42, 9], [11, 5]]
    n = 10
    kw = dict(temperature=0.9, top_k=40, seed=123)

    plain = PagedEngine(params=target, config=config, num_slots=2,
                        block_size=8, num_blocks=16, max_len=64)
    prids = [plain.submit(p, max_new_tokens=n, **kw) for p in prompts]
    pout = plain.run()
    want_s = [pout[r] for r in prids]

    eng = PagedSpeculativeEngine(
        params=target, config=config,
        draft_params=target, draft_config=config,
        k=3, num_slots=2, block_size=8, num_blocks=16, max_len=64,
    )
    rids = [eng.submit(p, max_new_tokens=n, **kw) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want_s
    assert eng.stats.bonus > 0

    want_g = _greedy_oracle(config, target, prompts, n)
    mixed = PagedSpeculativeEngine(
        params=target, config=config,
        draft_params=target, draft_config=config,
        k=3, num_slots=2, block_size=8, num_blocks=16, max_len=64,
    )
    r1 = mixed.submit(prompts[0], max_new_tokens=n)        # greedy slot
    r2 = mixed.submit(prompts[1], max_new_tokens=n, **kw)  # sampled slot
    mout = mixed.run()
    assert mout[r1] == want_g[0]
    assert mout[r2] == want_s[1]


@pytest.mark.slow
def test_pool_pressure_and_prefix_sharing(tiny_pair):
    """More requests than the pool holds at once queue and complete; a
    shared 1-block prompt prefix is reused by reference through the
    speculative admission path (draft still prefills the full prompt)."""
    config, target, _ = tiny_pair
    common = [5, 9, 2, 14, 3, 8, 1, 6]  # one full block (block_size=8)
    prompts = [common + [i + 20] for i in range(4)]
    n = 6
    want = _greedy_oracle(config, target, prompts, n)
    eng = PagedSpeculativeEngine(
        params=target, config=config,
        draft_params=target, draft_config=config,
        k=2, num_slots=2, block_size=8, num_blocks=10, max_len=40,
        prefix_cache_blocks=2,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want
    assert eng.prefix_hits >= 1
    assert eng.blocks_in_use == 0


def test_guards(tiny_pair):
    """Constructor guards: missing draft, k >= 1; submit accounts the
    k+1 verify tail in max_len."""
    config, target, _ = tiny_pair
    with pytest.raises(ValueError, match="draft_params"):
        PagedSpeculativeEngine(params=target, config=config)
    with pytest.raises(ValueError, match="k must be"):
        PagedSpeculativeEngine(
            params=target, config=config,
            draft_params=target, draft_config=config, k=0,
        )
    eng = PagedSpeculativeEngine(
        params=target, config=config,
        draft_params=target, draft_config=config,
        k=4, num_slots=1, block_size=8, num_blocks=8, max_len=32,
    )
    with pytest.raises(ValueError, match="exceeds"):
        # 20 + 8 + (4+1) = 33 > 32 — would pass the plain engine's +1 tail
        eng.submit(list(range(20)), max_new_tokens=8)


@pytest.mark.slow
def test_gemma2_paged_speculative_matches_dense():
    """Gemma-2 target AND Gemma-2 draft through the speculative paged
    path: softcap + per-row sliding windows ride the fused verify kernel
    (the tiny config's window of 8 is crossed by the k-ahead run), the
    draft decodes through its own dense-cache gemma2 forward. Output
    equals the dense-cache Engine; bonus tokens flow (self-draft)."""
    from flute_tpu.models import gemma2
    from flute_tpu.serving import Engine as DenseEngine

    config = gemma2.Gemma2Config.tiny()
    params = gemma2.init_params(config, rng=0)
    qparams = gemma2.quantize_model(params, num_bits=4, group_size=64)
    prompts = [[3, 17, 42, 9], [11, 5, 8, 1, 13, 2]]
    n = 8
    dense = DenseEngine(
        params=qparams, config=config, max_len=64, batch_size=len(prompts),
        forward=gemma2.forward, init_cache=gemma2.init_cache,
    )
    want = dense.generate(prompts, max_new_tokens=n)

    eng = PagedSpeculativeEngine(
        params=qparams, config=config,
        draft_params=qparams, draft_config=config,
        k=3, num_slots=2, block_size=8, num_blocks=12, max_len=32,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want
    assert eng.stats.bonus > 0
    assert eng.blocks_in_use == 0


@pytest.mark.slow
def test_pool_prefill_speculative(tiny_pair):
    """pool_prefill composes with speculation: admission rides the shared
    multi-token paged forward, rounds still equal plain greedy decode."""
    config, target, _ = tiny_pair
    prompts = [[3, 17, 42, 9], [11, 5, 8, 1, 13, 2, 7]]
    n = 8
    want = _greedy_oracle(config, target, prompts, n)
    eng = PagedSpeculativeEngine(
        params=target, config=config,
        draft_params=target, draft_config=config,
        k=3, num_slots=2, block_size=8, num_blocks=14, max_len=48,
        pool_prefill=True,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want
    assert eng.stats.bonus > 0
    assert eng.blocks_in_use == 0
