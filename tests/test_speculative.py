"""Speculative decoding tests.

The core invariant: the emitted stream is always the *target* model's
greedy choice under the verify forward — a draft (good, bad, or the
target itself) can change speed, never output. Oracle: plain greedy
Engine.generate on the target. Seeds are chosen so greedy argmax is
stable across the T=1 / T=k+1 forward shapes (see round-1 lesson on
greedy-equality oracles); don't change them casually.
"""

import numpy as np
import pytest

from flute_tpu.models import llama
from flute_tpu.serving import Engine
from flute_tpu.serving.speculative import SpeculativeEngine


@pytest.fixture(scope="module")
def tiny_pair():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    target = llama.quantize_model(params, num_bits=4, group_size=64)
    # an independent (differently-initialized) draft of the same shape:
    # worst-case drafter — proposals rarely match
    draft_params = llama.init_params(config, rng=7)
    draft = llama.quantize_model(draft_params, num_bits=4, group_size=64)
    return config, target, draft


def _greedy_oracle(config, qparams, prompts, n):
    eng = Engine(params=qparams, config=config, max_len=96,
                 batch_size=len(prompts))
    return eng.generate(prompts, max_new_tokens=n)


@pytest.mark.slow
def test_self_draft_matches_greedy_and_accepts(tiny_pair):
    """Draft == target: output equals plain greedy decode and acceptance
    is high (the draft proposes exactly what the target would pick)."""
    config, target, _ = tiny_pair
    prompts = [[3, 17, 42, 9], [11, 5]]
    n = 12
    want = _greedy_oracle(config, target, prompts, n)

    eng = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=target, draft_config=config,
        k=3, max_len=96, batch_size=2,
    )
    got = eng.generate(prompts, max_new_tokens=n)
    assert got == want
    assert eng.stats.acceptance_rate > 0.8
    # a self-draft fully accepts, so bonus tokens must actually flow —
    # and a perfect round then yields k+1 tokens
    assert eng.stats.bonus > 0
    assert eng.stats.rounds <= -(-n // (eng.k + 1)) + 1


@pytest.mark.slow
def test_bad_draft_still_matches_greedy(tiny_pair):
    """An unrelated draft model cannot corrupt output — only slow it."""
    config, target, draft = tiny_pair
    prompts = [[3, 17, 42, 9], [11, 5]]
    n = 12
    want = _greedy_oracle(config, target, prompts, n)

    eng = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=draft, draft_config=config,
        k=3, max_len=96, batch_size=2,
    )
    got = eng.generate(prompts, max_new_tokens=n)
    assert got == want
    # and it genuinely went through rejection rounds
    assert eng.stats.proposed > 0
    assert eng.stats.accepted < eng.stats.proposed


@pytest.mark.slow
def test_heterogeneous_draft_config(tiny_pair):
    """Draft with a different architecture (fewer layers) — the configs
    are independent; only the vocab must match."""
    config, target, _ = tiny_pair
    import dataclasses

    dconfig = dataclasses.replace(config, num_layers=1)
    dparams = llama.quantize_model(
        llama.init_params(dconfig, rng=3), num_bits=4, group_size=64
    )
    prompts = [[3, 17, 42, 9]]
    n = 10
    want = _greedy_oracle(config, target, prompts, n)
    eng = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=dparams, draft_config=dconfig,
        k=4, max_len=96, batch_size=1,
    )
    assert eng.generate(prompts, max_new_tokens=n) == want


@pytest.mark.slow
def test_eos_stops_early(tiny_pair):
    """A sequence hitting eos inside an accepted run stops there."""
    config, target, _ = tiny_pair
    prompts = [[3, 17, 42, 9]]
    want = _greedy_oracle(config, target, prompts, 8)[0]
    assert len(want) >= 3
    eos = want[2]  # third greedy token as eos -> expect exactly 2 tokens
    eng = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=target, draft_config=config,
        k=3, max_len=96, batch_size=1,
    )
    got = eng.generate(prompts, max_new_tokens=8, eos_id=eos)
    assert got[0] == want[:2]


@pytest.mark.slow
def test_bonus_catchup_with_mixed_slots(tiny_pair):
    """One slot finishes (eos) while the other keeps fully accepting:
    catch-up rounds then mix pending and non-pending slots (the dup-token
    junk-write path); the surviving slot must still equal plain greedy."""
    config, target, _ = tiny_pair
    prompts = [[3, 17, 42, 9], [11, 5]]
    n = 16
    want = _greedy_oracle(config, target, prompts, n)
    eos = want[0][2]  # slot 0 stops after 2 tokens
    assert eos not in want[1], "pick a different eos index for these seeds"
    eng = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=target, draft_config=config,
        k=3, max_len=96, batch_size=2,
    )
    got = eng.generate(prompts, max_new_tokens=n, eos_id=eos)
    assert got[0] == want[0][:2]
    assert got[1] == want[1]
    assert eng.stats.bonus > 0


@pytest.mark.slow
def test_k1_equivalent_to_plain_decode(tiny_pair):
    """k=1 degenerates to verify-every-token; output unchanged."""
    config, target, draft = tiny_pair
    prompts = [[11, 5]]
    want = _greedy_oracle(config, target, prompts, 8)
    eng = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=draft, draft_config=config,
        k=1, max_len=96, batch_size=1,
    )
    assert eng.generate(prompts, max_new_tokens=8) == want


def test_accept_preserves_target_distribution(tiny_pair):
    """The modified-rejection-sampling theorem, empirically: with
    proposals x ~ q, the emitted first token (x if accepted, else the
    residual correction) must be distributed exactly as p — for ANY q.
    8192 independent seeds through the jitted accept kernel; binomial
    4-sigma tolerance per token."""
    import jax
    import jax.numpy as jnp

    config, target, _ = tiny_pair
    eng = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=target, draft_config=config,
        k=2, max_len=32, batch_size=1,
    )
    rng = np.random.default_rng(0)
    V, B, k = 16, 8192, 2
    p0 = rng.dirichlet(np.ones(V) * 0.3)
    q0 = rng.dirichlet(np.ones(V) * 0.3)  # deliberately unrelated to p0
    pb = rng.dirichlet(np.ones(V) * 0.3)  # bonus-position target dist
    p = np.concatenate(
        [np.tile(p0.astype(np.float32), (B, k, 1)),
         np.tile(pb.astype(np.float32), (B, 1, 1))], axis=1,
    )  # [B, k+1, V]: row k feeds the bonus draw
    q = np.tile(q0.astype(np.float32), (B, k, 1))
    proposals = rng.choice(V, size=(B, k), p=q0).astype(np.int32)
    seeds = np.arange(B, dtype=np.int32)
    gen = np.ones((B,), np.int32)
    a, corr, bonus = eng._accept(
        jax.random.PRNGKey(0), jnp.asarray(seeds), jnp.asarray(gen),
        jnp.asarray(proposals), jnp.asarray(p), jnp.asarray(q),
    )
    a, corr, bonus = np.asarray(a), np.asarray(corr), np.asarray(bonus)
    first = np.where(a >= 1, proposals[:, 0], corr)
    hist = np.bincount(first, minlength=V) / B
    tol = 4 * np.sqrt(p0 * (1 - p0) / B) + 2e-3
    assert (np.abs(hist - p0) <= tol).all(), np.abs(hist - p0) / tol
    # expected acceptance prob at position 0: sum_x min(p, q)
    acc0 = float((a >= 1).mean())
    want_acc = float(np.minimum(p0, q0).sum())
    assert abs(acc0 - want_acc) < 0.02
    # bonus tokens of fully-accepted slots must be distributed as p_k
    full = a == k
    assert full.sum() > 500  # enough mass for the histogram below
    bh = np.bincount(bonus[full], minlength=V) / full.sum()
    btol = 4 * np.sqrt(pb * (1 - pb) / full.sum()) + 2e-3
    assert (np.abs(bh - pb) <= btol).all(), np.abs(bh - pb) / btol


@pytest.mark.slow
def test_spec_sampled_draft_equals_target_matches_continuous(tiny_pair):
    """draft == target: every proposal is accepted (p == q up to forward-
    shape rounding) and the sampled stream matches the continuous
    engine's for the same per-request seeds — the key fold schemes are
    deliberately identical. Also determinism: same seeds, same output."""
    from flute_tpu.serving import ContinuousBatchingEngine
    from flute_tpu.serving.continuous import SamplingParams

    config, target, _ = tiny_pair
    prompts = [[3, 17, 42, 9], [11, 5]]
    n = 10
    sp = [
        SamplingParams(temperature=0.9, top_k=0, top_p=1.0, seed=s + 5)
        for s in range(2)
    ]
    cont = ContinuousBatchingEngine(
        params=target, config=config, num_slots=2, max_len=96
    )
    rids = [cont.submit(p, max_new_tokens=n, sampling=s)
            for p, s in zip(prompts, sp)]
    res = cont.run()
    want = [res[r] for r in rids]

    eng = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=target, draft_config=config,
        k=3, max_len=96, batch_size=2,
    )
    got = eng.generate(prompts, max_new_tokens=n, sampling=sp)
    assert got == want
    assert eng.stats.acceptance_rate > 0.9
    eng2 = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=target, draft_config=config,
        k=3, max_len=96, batch_size=2,
    )
    assert eng2.generate(prompts, max_new_tokens=n, sampling=sp) == got


@pytest.mark.slow
def test_spec_sampled_topk1_matches_greedy(tiny_pair):
    """top_k=1 at temperature 1 collapses both warped distributions to
    one-hots; the rejection rule then reduces exactly to the greedy
    acceptance path — outputs must be identical, even with a bad draft."""
    from flute_tpu.serving.continuous import SamplingParams

    config, target, draft = tiny_pair
    prompts = [[3, 17, 42, 9], [11, 5]]
    n = 10

    eng_g = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=draft, draft_config=config,
        k=3, max_len=96, batch_size=2,
    )
    want = eng_g.generate(prompts, max_new_tokens=n)

    eng_s = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=draft, draft_config=config,
        k=3, max_len=96, batch_size=2,
    )
    got = eng_s.generate(
        prompts, max_new_tokens=n,
        sampling=SamplingParams(temperature=1.0, top_k=1, seed=3),
    )
    assert got == want


@pytest.mark.slow
def test_stop_token_ids_speculative(tiny_pair):
    """SamplingParams.stop_token_ids through the dense speculative engine
    (sampled mode): truncates exactly where the plain sampled stream
    first produces the stop token."""
    from flute_tpu.serving.continuous import SamplingParams

    config, target, _ = tiny_pair
    prompts = [[3, 17, 42, 9]]
    n = 12
    sp = SamplingParams(temperature=0.9, top_k=40, seed=123)
    eng = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=target, draft_config=config,
        k=3, max_len=96, batch_size=1,
    )
    full = eng.generate(prompts, max_new_tokens=n, sampling=sp)[0]
    stop = full[4]
    sp2 = SamplingParams(temperature=0.9, top_k=40, seed=123,
                         stop_token_ids=(stop,))
    eng2 = SpeculativeEngine(
        target_params=target, target_config=config,
        draft_params=target, draft_config=config,
        k=3, max_len=96, batch_size=1,
    )
    got = eng2.generate(prompts, max_new_tokens=n, sampling=sp2)[0]
    assert got == full[:full.index(stop)]
