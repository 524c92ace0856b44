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


def test_kernel_softcap_and_window_match_reference():
    """Gemma-2 kernel variants: tanh logit softcap and sliding window
    (incl. window edges inside and across block boundaries)."""
    rng = np.random.default_rng(2)
    B, h, hkv, D, BS, MB, NB = 3, 8, 2, 128, 16, 4, 16
    q = jnp.asarray(rng.standard_normal((B, h, D)), jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((NB, hkv, BS, D)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((NB, hkv, BS, D)), jnp.bfloat16)
    tables = jnp.asarray(
        rng.permutation(NB)[: B * MB].reshape(B, MB), jnp.int32
    )
    lengths = jnp.asarray([37, 16, 64], jnp.int32)
    for softcap, window in [(50.0, None), (None, 10), (30.0, 24), (50.0, 3)]:
        want = paged_gqa_reference(
            q, kp, vp, tables, lengths, softcap=softcap, window=window
        )
        got = paged_decode_attention(
            q, kp, vp, tables, lengths,
            softcap=softcap, window=window, interpret=True,
        )
        err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
        denom = max(np.abs(np.asarray(want, np.float32)).max(), 1e-6)
        assert err.max() / denom < 1.1e-2, (softcap, window)


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


def test_verify_kernel_matches_reference():
    """Fused multi-query verify kernel (speculative T=k+1 through the
    pool): per-row attendable lengths, block-edge boundary (a live block
    fully masked for early rows — the -1e30 sentinel path), softcap and
    sliding-window variants, and T=1 degeneration to the decode kernel."""
    from flute_tpu.ops.paged_attention import (
        paged_verify_attention,
        paged_verify_reference,
    )

    rng = np.random.default_rng(3)
    B, T, D, BS, MB, NB = 3, 5, 128, 16, 6, 24
    kp = jnp.asarray(rng.standard_normal((NB, 2, BS, D)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((NB, 2, BS, D)), jnp.bfloat16)
    tables = jnp.asarray(
        rng.permutation(NB)[: B * MB].reshape(B, MB), jnp.int32
    )

    def check(q, lengths, **kw):
        want = paged_verify_reference(q, kp, vp, tables, lengths, **kw)
        got = paged_verify_attention(
            q, kp, vp, tables, lengths, interpret=True, **kw
        )
        err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
        denom = max(np.abs(np.asarray(want, np.float32)).max(), 1e-6)
        assert err.max() / denom < 1.1e-2, kw

    q = jnp.asarray(rng.standard_normal((B, T, 8, D)), jnp.bfloat16)
    # length one below a block edge: the first live block is fully masked
    # for early rows (would nan with -inf masking)
    check(q, jnp.asarray([15, 16, 75], jnp.int32))
    check(q, jnp.asarray([37, 16, 75], jnp.int32))
    for softcap, window in [(50.0, None), (None, 10), (30.0, 24), (50.0, 3)]:
        check(q, jnp.asarray([15, 37, 75], jnp.int32),
              softcap=softcap, window=window)
    # MHA
    q2 = jnp.asarray(rng.standard_normal((B, T, 2, D)), jnp.bfloat16)
    check(q2, jnp.asarray([15, 16, 63], jnp.int32))
    # T=1 == the decode kernel on lengths+1
    q1 = jnp.asarray(rng.standard_normal((B, 1, 8, D)), jnp.bfloat16)
    ln = jnp.asarray([15, 37, 75], jnp.int32)
    want = paged_decode_attention(q1[:, 0], kp, vp, tables, ln + 1,
                                  interpret=True)
    got = paged_verify_attention(q1, kp, vp, tables, ln, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[:, 0]), np.asarray(want))


@pytest.fixture(scope="module")
def tiny_q():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    return config, llama.quantize_model(params, num_bits=4, group_size=64)


@pytest.mark.slow
def test_paged_engine_matches_dense_engine(tiny_q):
    """Greedy outputs through the paged pool equal the dense-cache Engine
    (same model, same prompts) and all blocks return to the free list."""
    config, qparams = tiny_q
    # two prompts (one admission bucket each) keep the fast tier lean;
    # per-sequence streams are batch-composition-independent, so dropping
    # a prompt does not change the remaining oracles
    prompts = [[3, 17, 42, 9], [11, 5]]
    n = 6
    dense = Engine(params=qparams, config=config, max_len=64,
                   batch_size=len(prompts))
    want = dense.generate(prompts, max_new_tokens=n)

    eng = PagedEngine(
        params=qparams, config=config, num_slots=2,
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


@pytest.mark.slow
def test_paged_gemma2_matches_dense_engine():
    """Gemma-2 through the paged pool (softcap + sliding-window kernel
    variants, sandwich norms, GeGLU) equals the dense-cache Engine. The
    tiny config's window (8) is small enough that decode crosses it."""
    from flute_tpu.models import gemma2

    config = gemma2.Gemma2Config.tiny()
    params = gemma2.init_params(config, rng=0)
    qparams = gemma2.quantize_model(params, num_bits=4, group_size=64)
    prompts = [[3, 17, 42, 9], [11, 5, 8, 1, 13, 2]]
    n = 8
    dense = Engine(
        params=qparams, config=config, max_len=64, batch_size=len(prompts),
        forward=gemma2.forward, init_cache=gemma2.init_cache,
    )
    want = dense.generate(prompts, max_new_tokens=n)

    eng = PagedEngine(
        params=qparams, config=config, num_slots=2,
        block_size=8, num_blocks=10, max_len=32,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want
    assert eng.blocks_in_use == 0


@pytest.mark.slow
def test_paged_sampled_topk1_matches_greedy(tiny_q):
    """temperature>0 with top_k=1 collapses to argmax — must reproduce the
    greedy stream exactly through the sampled decode path."""
    config, qparams = tiny_q
    prompts = [[3, 17, 42, 9], [11, 5]]
    n = 6
    greedy = PagedEngine(
        params=qparams, config=config, num_slots=2,
        block_size=8, num_blocks=8, max_len=32,
    )
    rids = [greedy.submit(p, max_new_tokens=n) for p in prompts]
    gout = greedy.run()
    want = [gout[r] for r in rids]

    eng = PagedEngine(
        params=qparams, config=config, num_slots=2,
        block_size=8, num_blocks=8, max_len=32,
    )
    rids = [
        eng.submit(p, max_new_tokens=n, temperature=1.0, top_k=1, seed=s)
        for s, p in enumerate(prompts)
    ]
    out = eng.run()
    assert [out[r] for r in rids] == want


@pytest.mark.slow
def test_paged_sampling_deterministic_and_greedy_isolated(tiny_q):
    """Same seed twice -> identical sampled stream; a greedy request
    sharing the batch with sampled neighbors is unaffected by them."""
    config, qparams = tiny_q
    sampled_prompt, greedy_prompt = [3, 17, 42, 9], [11, 5, 8]
    n = 8

    def run_pair(seed):
        eng = PagedEngine(
            params=qparams, config=config, num_slots=2,
            block_size=8, num_blocks=10, max_len=32,
        )
        rs = eng.submit(
            sampled_prompt, max_new_tokens=n,
            temperature=0.9, top_k=0, top_p=1.0, seed=seed,
        )
        rg = eng.submit(greedy_prompt, max_new_tokens=n)
        out = eng.run()
        return out[rs], out[rg]

    s0a, g0a = run_pair(seed=7)
    s0b, g0b = run_pair(seed=7)
    assert s0a == s0b and g0a == g0b  # per-seed determinism

    solo = PagedEngine(
        params=qparams, config=config, num_slots=1,
        block_size=8, num_blocks=6, max_len=32,
    )
    rg = solo.submit(greedy_prompt, max_new_tokens=n)
    assert solo.run()[rg] == g0a  # greedy stream independent of neighbors


def test_submit_guards(tiny_q):
    config, qparams = tiny_q
    eng = PagedEngine(
        params=qparams, config=config, num_slots=1,
        block_size=8, num_blocks=4, max_len=16,
    )
    with pytest.raises(ValueError):
        eng.submit(list(range(12)), max_new_tokens=8)  # > max_len


@pytest.mark.slow
def test_pool_prefix_sharing_exact_and_counted(tiny_q):
    """Two requests sharing a 2-block system prefix: the second reuses the
    first's pool blocks by reference (zero prefill for the shared run) and
    its output equals a cold run. Blocks are refcounted and returned."""
    config, qparams = tiny_q
    system = list(range(1, 17))  # exactly 2 blocks of 8
    p_a = system + [21, 22, 23]
    p_b = system + [31, 32]
    n = 6

    cold = PagedEngine(
        params=qparams, config=config, num_slots=1,
        block_size=8, num_blocks=12, max_len=48,
    )
    rb = cold.submit(p_b, max_new_tokens=n)
    want_b = cold.run()[rb]

    eng = PagedEngine(
        params=qparams, config=config, num_slots=1,
        block_size=8, num_blocks=12, max_len=48,
        prefix_cache_blocks=4,
    )
    ra = eng.submit(p_a, max_new_tokens=n)
    out_a = eng.run()[ra]
    assert eng.prefix_hits == 0
    rb = eng.submit(p_b, max_new_tokens=n)
    out_b = eng.run()[rb]
    assert out_b == want_b
    assert eng.prefix_hits == 1 and eng.prefix_block_hits == 2
    assert eng.blocks_in_use == 0

    # a third request with the same prefix hits again — shared rows were
    # re-donated, not freed
    rc = eng.submit(system + [41], max_new_tokens=n)
    eng.run()
    assert eng.prefix_hits == 2

    # and a cold-equivalent rerun of p_a through the warm engine matches
    ra2 = eng.submit(p_a, max_new_tokens=n)
    assert eng.run()[ra2] == out_a


@pytest.mark.slow
def test_pool_prefix_eviction_under_pressure(tiny_q):
    """Cached zero-ref blocks are evicted LRU when the free list runs dry;
    live shared blocks are never evicted (pinned before allocation)."""
    config, qparams = tiny_q
    n = 4
    eng = PagedEngine(
        params=qparams, config=config, num_slots=1,
        block_size=8, num_blocks=8,  # 7 usable
        max_len=48, prefix_cache_blocks=8,
    )
    # request 1: 2-block prompt -> donates 2 cached blocks
    p1 = list(range(1, 17)) + [99]
    eng.submit(p1, max_new_tokens=n)
    eng.run()
    cached_before = len(eng._prefix_map)
    assert cached_before >= 2
    # request 2: large block need forces eviction of request 1's cached rows
    p2 = list(range(50, 50 + 33))  # 33 tokens + budget -> ~5-6 blocks
    r2 = eng.submit(p2, max_new_tokens=n)
    out = eng.run()
    assert len(out[r2]) == n
    assert eng.blocks_in_use == 0
    # rerun p1: must still be correct whether or not its cache survived
    r1b = eng.submit(p1, max_new_tokens=n)
    out1b = eng.run()[r1b]
    cold = PagedEngine(
        params=qparams, config=config, num_slots=1,
        block_size=8, num_blocks=8, max_len=48,
    )
    r1c = cold.submit(p1, max_new_tokens=n)
    assert cold.run()[r1c] == out1b


@pytest.mark.slow
def test_paged_chunked_prefill_matches_unchunked(tiny_q):
    """prefill_chunk splits the prompt into fixed-size chunk forwards at
    exact positions; the stream must equal the single-call prefill."""
    config, qparams = tiny_q
    prompts = [list(range(3, 24)), [11, 5]]  # 21 tokens -> 2 chunks + rem
    n = 5
    base = PagedEngine(
        params=qparams, config=config, num_slots=2,
        block_size=8, num_blocks=12, max_len=48,
    )
    rids = [base.submit(p, max_new_tokens=n) for p in prompts]
    res = base.run()
    want = [res[r] for r in rids]

    eng = PagedEngine(
        params=qparams, config=config, num_slots=2,
        block_size=8, num_blocks=12, max_len=48, prefill_chunk=8,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    res = eng.run()
    assert [res[r] for r in rids] == want
    assert eng.blocks_in_use == 0


@pytest.mark.slow
def test_pool_prefill_matches_dense_scratch(tiny_q):
    """pool_prefill=True (prompt chunks written straight into pool blocks,
    attention via the fused multi-query kernel, no scratch/splice/scatter)
    reproduces the dense-cache Engine stream (unchunked; the chunked and
    prefix-sharing variants are in the slow tier)."""
    config, qparams = tiny_q
    prompts = [[3, 17, 42, 9], [11, 5], [7, 7, 2, 19, 4, 1, 8, 3, 2, 14, 6]]
    n = 8
    dense = Engine(params=qparams, config=config, max_len=64, batch_size=3)
    want = dense.generate(prompts, max_new_tokens=n)
    eng = PagedEngine(
        params=qparams, config=config, num_slots=3,
        block_size=8, num_blocks=16, max_len=48, pool_prefill=True,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want
    assert eng.blocks_in_use == 0


@pytest.mark.slow
def test_pool_prefill_chunked_and_prefix(tiny_q):
    """pool_prefill chunked at an unaligned width, and with a shared
    prefix block (zero-copy attend through the block table)."""
    config, qparams = tiny_q
    prompts = [[3, 17, 42, 9], [11, 5], [7, 7, 2, 19, 4, 1, 8, 3, 2, 14, 6]]
    n = 8
    dense = Engine(params=qparams, config=config, max_len=64, batch_size=3)
    want = dense.generate(prompts, max_new_tokens=n)
    eng = PagedEngine(
        params=qparams, config=config, num_slots=3,
        block_size=8, num_blocks=16, max_len=48,
        pool_prefill=True, prefill_chunk=4,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want
    assert eng.blocks_in_use == 0

    common = [5, 9, 2, 14, 3, 8, 1, 6]  # one full block
    ps = [common + [20], common + [21]]
    dense2 = Engine(params=qparams, config=config, max_len=64, batch_size=2)
    want2 = dense2.generate(ps, max_new_tokens=6)
    eng = PagedEngine(
        params=qparams, config=config, num_slots=1,
        block_size=8, num_blocks=10, max_len=32,
        pool_prefill=True, prefix_cache_blocks=2,
    )
    rids = [eng.submit(p, max_new_tokens=6) for p in ps]
    out = eng.run()
    assert [out[r] for r in rids] == want2
    assert eng.prefix_hits == 1


@pytest.mark.slow
def test_pool_prefill_gemma2_matches_dense():
    """Gemma-2 through pool-backed prefill: the prompt chunk's per-row
    sliding windows and softcap ride the same fused kernel."""
    from flute_tpu.models import gemma2

    config = gemma2.Gemma2Config.tiny()
    params = gemma2.init_params(config, rng=0)
    qparams = gemma2.quantize_model(params, num_bits=4, group_size=64)
    prompts = [[3, 17, 42, 9], [11, 5, 8, 1, 13, 2, 7, 9, 4, 2, 6]]
    n = 8
    dense = Engine(
        params=qparams, config=config, max_len=64, batch_size=len(prompts),
        forward=gemma2.forward, init_cache=gemma2.init_cache,
    )
    want = dense.generate(prompts, max_new_tokens=n)
    eng = PagedEngine(
        params=qparams, config=config, num_slots=2,
        block_size=8, num_blocks=10, max_len=32,
        pool_prefill=True, prefill_chunk=4,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    assert [out[r] for r in rids] == want
    assert eng.blocks_in_use == 0


@pytest.mark.slow
def test_stop_token_ids_paged_and_speculative(tiny_q):
    """stop_token_ids through the paged engine and the speculative paged
    engine (a stop hit mid-verify-round must truncate the emitted run and
    free the slot's blocks)."""
    from flute_tpu.serving.paged_spec import PagedSpeculativeEngine

    config, qparams = tiny_q
    ref = PagedEngine(
        params=qparams, config=config, num_slots=1,
        block_size=8, num_blocks=8, max_len=32,
    )
    rid = ref.submit([3, 17, 42, 9], max_new_tokens=8)
    full = ref.run()[rid]
    stop = full[3]

    eng = PagedEngine(
        params=qparams, config=config, num_slots=1,
        block_size=8, num_blocks=8, max_len=32,
    )
    rid = eng.submit([3, 17, 42, 9], max_new_tokens=8, stop_token_ids=(stop,))
    assert eng.run()[rid] == full[:full.index(stop)]
    assert eng.blocks_in_use == 0

    spec = PagedSpeculativeEngine(
        params=qparams, config=config,
        draft_params=qparams, draft_config=config,
        k=3, num_slots=1, block_size=8, num_blocks=10, max_len=48,
    )
    rid = spec.submit([3, 17, 42, 9], max_new_tokens=8, stop_token_ids=(stop,))
    assert spec.run()[rid] == full[:full.index(stop)]
    assert spec.blocks_in_use == 0


@pytest.mark.slow
def test_penalties_paged(tiny_q):
    """Penalties through the paged engine, both prefill modes. The two
    modes may legitimately diverge under penalty (compressed logit
    margins expose bf16 near-ties between the dense and fused-kernel
    prefill attention — measured margin 5e-3 at the first divergence),
    so each mode is checked for the penalty CONTRACT, not cross-mode
    equality: no immediate repeats, differs from its own unpenalized
    stream, deterministic, and exact no-op at default params."""
    from flute_tpu.serving.paged_spec import PagedSpeculativeEngine

    config, qparams = tiny_q
    for pool in (False, True):
        def run(**kw):
            eng = PagedEngine(
                params=qparams, config=config, num_slots=2, block_size=8,
                num_blocks=12, max_len=32, pool_prefill=pool,
            )
            r1 = eng.submit([3, 17, 42, 9], max_new_tokens=8, **kw)
            r2 = eng.submit([11, 5], max_new_tokens=8, **kw)
            out = eng.run()
            return [out[r1], out[r2]]

        base = run()
        assert any(base[1][i] == base[1][i + 1] for i in range(7))
        assert run() == base
        pen = run(repetition_penalty=1.8)
        assert pen != base, pool
        assert all(pen[1][i] != pen[1][i + 1] for i in range(7)), (pool, pen)
        assert run(repetition_penalty=1.8) == pen

    # the speculative subclass rejects penalties (no output counts in the
    # verify path) but still decodes greedily with the new parent internals
    spec = PagedSpeculativeEngine(
        params=qparams, config=config, draft_params=qparams,
        draft_config=config, k=2, num_slots=1, block_size=8,
        num_blocks=10, max_len=32,
    )
    with pytest.raises(ValueError, match="penalties"):
        spec.submit([1, 2, 3], max_new_tokens=4, repetition_penalty=1.5)
