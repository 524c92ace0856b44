"""Continuous-batching engine tests: staggered admission, slot reuse,
determinism, and agreement with the static-batch engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu.models import llama
from flute_tpu.serving import Engine
from flute_tpu.serving.continuous import ContinuousBatchingEngine


@pytest.fixture(scope="module")
def tiny_q():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    qparams = llama.quantize_model(params, num_bits=4, group_size=64)
    return config, qparams


@pytest.mark.slow
def test_more_requests_than_slots(tiny_q):
    config, qparams = tiny_q
    eng = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=2, max_len=32
    )
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 100, rng.integers(2, 6)).tolist() for _ in range(5)]
    rids = [eng.submit(p, max_new_tokens=4) for p in prompts]
    out = eng.run()
    assert sorted(out) == sorted(rids)
    assert all(len(v) == 4 for v in out.values())


@pytest.mark.slow
def test_deterministic(tiny_q):
    config, qparams = tiny_q
    prompts = [[1, 5, 9], [2, 6, 10, 14], [3, 7]]

    def run():
        eng = ContinuousBatchingEngine(
            params=qparams, config=config, num_slots=2, max_len=32
        )
        rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
        out = eng.run()
        return [out[r] for r in rids]

    assert run() == run()


@pytest.mark.slow
def test_matches_static_engine(tiny_q):
    """Greedy outputs must match the static-batch Engine (same prefill
    math; decode uses vector positions — seed chosen with clear argmax
    margins; see test_pp.py note on tie sensitivity)."""
    config, qparams = tiny_q
    prompts = [[1, 5, 9], [2, 6, 10, 14]]

    eng_s = Engine(params=qparams, config=config, max_len=32, batch_size=2)
    want = eng_s.generate(prompts, max_new_tokens=5)

    eng_c = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=2, max_len=32
    )
    rids = [eng_c.submit(p, max_new_tokens=5) for p in prompts]
    out = eng_c.run()
    got = [out[r] for r in rids]
    assert got == want


@pytest.mark.slow
def test_eos_stops_early(tiny_q):
    config, qparams = tiny_q
    # find the greedy first token for a prompt, then use it as eos
    eng = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=1, max_len=32
    )
    rid = eng.submit([1, 5, 9], max_new_tokens=5)
    full = eng.run()[rid]

    eng2 = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=1, max_len=32,
        eos_id=full[1],
    )
    rid2 = eng2.submit([1, 5, 9], max_new_tokens=5)
    out = eng2.run()[rid2]
    assert out == full[:1]


@pytest.mark.slow
def test_gemma2_continuous_engine():
    """Gemma-2 under the continuous engine: decode passes a [B] position
    vector into gemma2.forward (advisor finding r1 — the pos.ndim==1
    branch was missing and crashed on the first decode step)."""
    from flute_tpu.models import gemma2

    config = gemma2.Gemma2Config.tiny()
    params = gemma2.init_params(config, rng=0)
    qparams = gemma2.quantize_model(params, num_bits=4, group_size=64, chunk=128)
    eng = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=2, max_len=32,
        forward=gemma2.forward, init_cache=gemma2.init_cache,
    )
    prompts = [[1, 5, 9], [2, 6, 10, 14], [3, 7]]
    rids = [eng.submit(p, max_new_tokens=4) for p in prompts]
    out = eng.run()
    assert sorted(out) == sorted(rids)
    assert all(len(v) == 4 for v in out.values())


@pytest.mark.slow
def test_chunked_prefill_matches_whole_bucket(tiny_q):
    """Chunked prefill admission must reproduce whole-bucket greedy output
    (same K/V content; junk tail positions are causally masked and
    overwritten by decode before ever being attended)."""
    config, qparams = tiny_q
    prompts = [[1, 5, 9], list(range(2, 25))]  # short + long (chunks at 8)

    def run(chunk):
        eng = ContinuousBatchingEngine(
            params=qparams, config=config, num_slots=2, max_len=64,
            prefill_chunk=chunk,
        )
        rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
        out = eng.run()
        return [out[r] for r in rids]

    assert run(None) == run(8)


@pytest.mark.slow
def test_per_request_sampling_engine(tiny_q):
    """Mixed greedy + sampled slots in one engine population."""
    from flute_tpu.serving.continuous import SamplingParams

    config, qparams = tiny_q
    eng = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=3, max_len=48
    )
    g = eng.submit([1, 5, 9], max_new_tokens=6)
    s1 = eng.submit([1, 5, 9], max_new_tokens=6,
                    sampling=SamplingParams(temperature=3.0, top_k=50, seed=1))
    s2 = eng.submit([1, 5, 9], max_new_tokens=6,
                    sampling=SamplingParams(temperature=3.0, top_k=50, seed=2))
    out = eng.run()

    # greedy slot unaffected by samplers sharing the batch
    eng2 = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=1, max_len=48
    )
    g2 = eng2.submit([1, 5, 9], max_new_tokens=6)
    assert out[g] == eng2.run()[g2]
    assert len(out[s1]) == 6 and len(out[s2]) == 6


@pytest.mark.slow
def test_prefix_cache_exact_and_hit_counting(tiny_q):
    """Prefix caching: a request extending a previously-seen prompt splices
    the cached K/V blocks and prefills only the tail — outputs identical to
    the uncached engine; LRU eviction bounds the store (in blocks)."""
    config, qparams = tiny_q
    base = [1, 5, 9, 2, 6]
    prompts = [base, base + [10, 14], base + [10, 14, 3]]

    def run(entries):
        eng = ContinuousBatchingEngine(
            params=qparams, config=config, num_slots=1, max_len=64,
            prefix_cache_entries=entries, prefix_block=4,
        )
        outs = []
        for p in prompts:
            rid = eng.submit(p, max_new_tokens=5)
            outs.append(eng.run()[rid])
        return outs, eng

    cold, _ = run(0)
    warm, eng = run(4)
    assert warm == cold
    # prompts 2 and 3 reuse the first 4-token block of the base prompt
    assert eng.prefix_hits == 2
    assert eng.prefix_block_hits == 2
    # stored blocks: base[:4] and (base+[10,14,3])[:8]
    assert len(eng._prefix_store) == 2

    # LRU eviction caps the store (in blocks)
    _, eng1 = run(1)
    assert len(eng1._prefix_store) == 1


@pytest.mark.slow
def test_prefix_cache_shared_prefix_divergent_tails(tiny_q):
    """Two prompts sharing a system prefix but with different tails must
    BOTH hit the shared blocks (the r2 whole-prompt design re-prefilled
    everything when tails diverged)."""
    config, qparams = tiny_q
    system = [7, 3, 11, 2, 9, 4, 13, 1]  # two 4-token blocks
    pa = system + [21, 22, 23]
    pb = system + [31, 32]

    def run(entries):
        eng = ContinuousBatchingEngine(
            params=qparams, config=config, num_slots=1, max_len=64,
            prefix_cache_entries=entries, prefix_block=4,
        )
        outs = []
        for p in (system, pa, pb):
            rid = eng.submit(p, max_new_tokens=5)
            outs.append(eng.run()[rid])
        return outs, eng

    cold, _ = run(0)
    warm, eng = run(8)
    assert warm == cold
    # pa and pb each spliced both shared system blocks
    assert eng.prefix_hits == 2
    assert eng.prefix_block_hits == 4


def test_prefix_block_store_and_lookup_unit():
    """Pure-unit coverage of the block prefix cache (fast tier): store,
    contiguous lookup, proper-prefix rule, and LRU eviction — no engine
    run, no kernels."""
    eng = object.__new__(ContinuousBatchingEngine)
    eng.prefix_block = 4
    eng.prefix_cache_entries = 3
    eng.prefix_hits = 0
    eng.prefix_block_hits = 0
    from collections import OrderedDict

    eng._prefix_store = OrderedDict()

    prompt = list(range(100, 112))  # 3 complete blocks of 4
    # fake per-layer K/V: one layer, [B=1, H=1, S, D=2]
    s = np.arange(1 * 1 * 16 * 2, dtype=np.float32).reshape(1, 1, 16, 2)
    cache = {"k": [s], "v": [s + 100]}
    eng._store_prefix(prompt, cache, start=0, plen=12)
    assert len(eng._prefix_store) == 3

    # stored block i holds K/V columns [(i-1)*bs, i*bs)
    blk2 = eng._prefix_store[tuple(prompt[:8])]
    np.testing.assert_array_equal(np.asarray(blk2["k"][0]), s[:, :, 4:8])

    # shared prefix, divergent tail: both blocks covering the shared part hit
    hit = eng._find_prefix(prompt[:8] + [7, 7, 7])
    assert len(hit) == 2
    # proper-prefix rule: a prompt equal to stored blocks leaves >= 1 token
    hit = eng._find_prefix(prompt[:8])
    assert len(hit) == 1
    # contiguity: a missing earlier block stops the splice
    del eng._prefix_store[tuple(prompt[:4])]
    assert eng._find_prefix(prompt) == []

    # LRU eviction: capacity 3, inserting 2 more complete blocks evicts oldest
    p2 = list(range(200, 208))
    eng._store_prefix(p2, cache, start=0, plen=8)
    assert len(eng._prefix_store) == 3
    assert tuple(prompt[:8]) not in eng._prefix_store


@pytest.mark.slow
def test_stop_token_ids_truncate(tiny_q):
    """Per-request stop_token_ids (vLLM SamplingParams parity): the
    stream truncates just before the first stop token; other requests in
    the same batch are unaffected."""
    config, qparams = tiny_q
    eng = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=2, max_len=32
    )
    r1 = eng.submit([3, 17, 42, 9], max_new_tokens=8)
    r2 = eng.submit([11, 5], max_new_tokens=8)
    out = eng.run()
    full1, full2 = out[r1], out[r2]
    assert len(full1) == 8
    stop = full1[3]  # cut request 1 after 3 tokens

    eng = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=2, max_len=32
    )
    r1 = eng.submit([3, 17, 42, 9], max_new_tokens=8, stop_token_ids=(stop,))
    r2 = eng.submit([11, 5], max_new_tokens=8)
    out = eng.run()
    assert out[r1] == full1[:full1.index(stop)]
    assert out[r2] == full2


@pytest.mark.slow
def test_logprobs_recorded(tiny_q):
    """Per-token logprobs (OpenAI/vLLM "logprobs"): recorded parallel to
    the output, finite and <= 0, deterministic across runs, and identical
    between greedy and sampled-with-top_k=1 (same tokens, same raw-model
    log-softmax values)."""
    config, qparams = tiny_q

    def run(**kw):
        eng = ContinuousBatchingEngine(
            params=qparams, config=config, num_slots=1, max_len=32
        )
        rid = eng.submit([3, 17, 42, 9], max_new_tokens=6, **kw)
        out = eng.run()[rid]
        return out, eng.finished_logprobs[rid]

    toks1, lp1 = run()
    toks2, lp2 = run()
    assert toks1 == toks2 and lp1 == lp2
    assert len(lp1) == len(toks1) == 6
    assert all(np.isfinite(v) and v <= 0.0 for v in lp1)

    toks3, lp3 = run(temperature=0.5, top_k=1)
    assert toks3 == toks1
    np.testing.assert_allclose(lp3, lp1, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_penalties(tiny_q):
    """vLLM-parity penalties: defaults are an exact no-op (identical
    stream and logprobs), repetition_penalty eliminates the tiny model's
    repetition loops (and applies to the first post-prefill draw), and
    presence_penalty alone also breaks the loop. Deterministic per run."""
    config, qparams = tiny_q

    def run(**kw):
        eng = ContinuousBatchingEngine(
            params=qparams, config=config, num_slots=2, max_len=32
        )
        r1 = eng.submit([3, 17, 42, 9], max_new_tokens=8, **kw)
        r2 = eng.submit([11, 5], max_new_tokens=8, **kw)
        out = eng.run()
        return [out[r1], out[r2]]

    base = run()
    # the tiny model loops on this prompt — the penalty must have work to do
    assert any(base[1][i] == base[1][i + 1] for i in range(7))
    assert run() == base  # defaults reproduce exactly (identity penalty)

    pen = run(repetition_penalty=1.8)
    assert pen != base
    assert all(pen[1][i] != pen[1][i + 1] for i in range(7)), pen[1]
    assert run(repetition_penalty=1.8) == pen  # deterministic

    pres = run(presence_penalty=4.0)
    assert pres[1] != base[1]
    assert all(pres[1][i] != pres[1][i + 1] for i in range(7)), pres[1]
