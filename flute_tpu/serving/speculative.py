"""Speculative decoding: a small draft model proposes, the quantized
target verifies k proposals in one forward.

Beyond-parity capability (the reference has no serving loop of its own —
SURVEY §2.2 "vLLM integration"; speculative decoding is the standard
next step a vLLM user expects, ROADMAP "Serving"). TPU-first design:

  * **Static shapes throughout** — the draft step is a T=1 forward, the
    verify step a T=k+1 forward; both are jitted once. Per-sequence
    acceptance raggedness lives in host-side numpy position vectors
    (``llama.forward`` takes per-slot ``pos`` vectors, the same contract
    continuous batching uses), never in traced control flow.
  * **Greedy acceptance**: draft token i is accepted iff it equals the
    target's argmax at verify position i-1; the first mismatch is
    replaced by the target's own argmax ("correction token"). The
    emitted stream is therefore always the target model's greedy
    choice under its verify forward — a wrong draft can only cost
    speed, never change output.
  * **Speculative sampling** (``generate(..., sampling=...)``): the
    draft *samples* proposals from its warped distribution q and the
    target verifies by rejection sampling — accept proposal x_j with
    probability min(1, p_j(x_j)/q_j(x_j)); on first rejection, emit a
    correction drawn from the residual max(p_j - q_j, 0) (normalized).
    The emitted stream is then distributed EXACTLY as target sampling
    (the modified-rejection-sampling theorem), with temperature/top-k/
    top-p warps applied identically to p and q
    (serving/continuous._warp_logits). Proposal randomness is keyed as
    (request seed, tokens generated) — the engines' shared scheme — so
    with draft == target every proposal is accepted and the stream is
    bit-identical to the plain engines' sampled stream with the same
    seed. Acceptance draws and residual draws fold one extra tag so
    they are independent of the proposal stream. The accept/residual
    computation is one jitted static-shape kernel (no [V]-sized host
    transfer).
  * **Bonus token on full acceptance**: when all k proposals are
    accepted, the verify forward's position-k output is emitted too —
    greedily its argmax, in sampled mode a draw from the warped p_k
    with the plain engines' (seed, count) key — so a perfect round
    yields k+1 tokens. The draft is then *two* tokens behind; the next
    round starts with a per-slot catch-up: one extra T=1 cache-fill
    forward consumes the straggler for bonus slots while non-bonus
    slots are fed a duplicate whose junk K/V lands on a slot that the
    very next write overwrites before it is ever attendable (the same
    junk-cache argument as below). Every forward stays T=1/T=k+1 —
    no new traced shapes, and draft == target keeps the sampled
    stream bit-identical to the plain engines'.
  * **Junk-cache safety**: rejected proposals leave K/V at slots beyond
    the new position. Every subsequent step writes its K/V *before*
    attention and the causal mask admits only ``j <= query slot``, so a
    junk slot is always overwritten before it first becomes attendable
    — the same argument as chunked prefill
    (serving/continuous.py chunk contract).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu.models import llama
from flute_tpu.serving.continuous import (
    SamplingParams,
    _sample_slots,
    _warp_logits,
)


@dataclasses.dataclass
class SpecStats:
    rounds: int = 0
    proposed: int = 0
    accepted: int = 0
    bonus: int = 0  # extra tokens emitted on fully-accepted rounds

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.proposed if self.proposed else 0.0


def make_accept_fn(k: int):
    """Build the jitted modified-rejection-sampling kernel shared by the
    dense and paged speculative engines.

    Per slot (static shapes): accept proposal x_j while
    u_j < p_j(x_j)/q_j(x_j); at the first rejection sample the correction
    from the residual max(p_j - q_j, 0); also draw the bonus token from
    p_k with the plain engines' un-tagged (seed, count) key. ``p_probs``
    is [B, k+1, V] (row k = bonus distribution), ``q_probs`` [B, k, V].
    Returns (accepted count a [B], correction [B] — valid when a < k,
    bonus [B] — valid when a == k)."""

    @jax.jit
    def accept_fn(key, seeds, gen, proposals, p_probs, q_probs):
        def per_slot(seed, g, props, p, q):
            jj = jnp.arange(k)
            px = p[jj, props]
            qx = jnp.maximum(q[jj, props], 1e-30)
            base = jax.random.fold_in(key, seed)
            # u_j: proposal key folded once more => independent of the
            # draw that produced x_j
            u = jax.vmap(
                lambda j: jax.random.uniform(
                    jax.random.fold_in(jax.random.fold_in(base, g + j), 1)
                )
            )(jj)
            acc = u < (px / qx)
            a = jnp.sum(jnp.cumprod(acc.astype(jnp.int32)))
            ai = jnp.minimum(a, k - 1)  # gather-safe; unused when a == k
            res = jnp.maximum(p[ai] - q[ai], 0.0)
            mass = jnp.sum(res)
            # p <= q everywhere can only co-occur with acceptance-prob-1
            # draws in exact arithmetic; numerically, fall back to p
            res = jnp.where(mass > 1e-12, res / mass, p[ai])
            rkey = jax.random.fold_in(jax.random.fold_in(base, g + a), 2)
            corr = jax.random.categorical(
                rkey, jnp.log(jnp.maximum(res, 1e-30))
            )
            # bonus (full acceptance): a draw from p_k with the plain
            # engines' un-tagged (seed, count) key — count g+k is exactly
            # where a non-speculative engine would be, so draft == target
            # extends bit-identity through the bonus
            bkey = jax.random.fold_in(base, g + k)
            bonus = jax.random.categorical(
                bkey, jnp.log(jnp.maximum(p[k], 1e-30))
            )
            return (a.astype(jnp.int32), corr.astype(jnp.int32),
                    bonus.astype(jnp.int32))

        return jax.vmap(per_slot)(seeds, gen, proposals, p_probs, q_probs)

    return accept_fn


@dataclasses.dataclass
class SpeculativeEngine:
    """Greedy speculative generation with a draft/target model pair.

    Both models must share the tokenizer/vocab. ``draft_params`` may be a
    narrower/shallower config, a more aggressively quantized variant of
    the target (e.g. W2 drafting for W4 — both already live in HBM
    packed), or even the target itself (for testing: near-total
    acceptance).
    """

    target_params: Any
    target_config: Any
    draft_params: Any
    draft_config: Any
    k: int = 4  # proposals per round
    forward: Callable = llama.forward
    init_cache: Callable = llama.init_cache
    max_len: int = 1024
    batch_size: int = 8
    pad_id: int = 0

    def __post_init__(self):
        if self.k < 1:
            raise ValueError(f"k must be >= 1, got {self.k}")
        fwd = self.forward
        tc, dc = self.target_config, self.draft_config

        @functools.partial(jax.jit, donate_argnums=(2,))
        def prefill_t(params, tokens, cache, offsets):
            logits, cache = fwd(params, tc, tokens, cache, jnp.int32(0), offsets)
            return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def prefill_d(params, tokens, cache, offsets):
            _, cache = fwd(params, dc, tokens, cache, jnp.int32(0), offsets)
            return cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def draft_step(params, tok, cache, pos_vec, offsets):
            logits, cache = fwd(params, dc, tok, cache, pos_vec, offsets)
            return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def fill_d(params, tok, cache, pos_vec, offsets):
            # catch-up cache fill after a bonus round: logits discarded
            _, cache = fwd(params, dc, tok, cache, pos_vec, offsets)
            return cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def verify_step(params, toks, cache, pos_vec, offsets):
            # toks [B, k+1]; greedy target token after each input position
            # (column k is the bonus token of a fully-accepted round)
            logits, cache = fwd(params, tc, toks, cache, pos_vec, offsets)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        k = self.k

        @functools.partial(jax.jit, donate_argnums=(2,))
        def prefill_t_sampled(params, tokens, cache, offsets,
                              key, seeds, temp, top_k, top_p):
            logits, cache = fwd(params, tc, tokens, cache, jnp.int32(0), offsets)
            # first generated token = draw 0 of the request's stream —
            # the same (seed, count) fold every engine uses
            keys = jax.vmap(
                lambda s: jax.random.fold_in(jax.random.fold_in(key, s), 0)
            )(seeds)
            nxt = _sample_slots(keys, logits[:, -1], temp, top_k, top_p)
            return nxt, cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def draft_step_sampled(params, tok, cache, pos_vec, offsets,
                               key, seeds, gen, temp, top_k, top_p):
            logits, cache = fwd(params, dc, tok, cache, pos_vec, offsets)
            warped = jax.vmap(_warp_logits)(logits[:, -1], temp, top_k, top_p)
            # proposal key = fold(fold(key, seed), count): IDENTICAL to the
            # plain engines' per-token scheme, so draft == target => the
            # sampled stream is bit-identical to non-speculative sampling
            keys = jax.vmap(
                lambda s, c: jax.random.fold_in(jax.random.fold_in(key, s), c)
            )(seeds, gen)
            nxt = jax.vmap(jax.random.categorical)(keys, warped)
            return nxt.astype(jnp.int32), jax.nn.softmax(warped), cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def verify_step_sampled(params, toks, cache, pos_vec, offsets,
                                temp, top_k, top_p):
            # toks [B, k+1]; p_j = warped target dist after consuming
            # [last, x_0..x_{j-1}] — positions 0..k; row k is the bonus
            # distribution, drawn from only on full acceptance
            logits, cache = fwd(params, tc, toks, cache, pos_vec, offsets)
            warped = jax.vmap(
                lambda rows, t, tk, tp: jax.vmap(
                    lambda r: _warp_logits(r, t, tk, tp)
                )(rows)
            )(logits.astype(jnp.float32), temp, top_k, top_p)
            return jax.nn.softmax(warped), cache

        accept_fn = make_accept_fn(k)

        self._prefill_t = prefill_t
        self._prefill_d = prefill_d
        self._draft = draft_step
        self._fill_d = fill_d
        self._verify = verify_step
        self._prefill_t_sampled = prefill_t_sampled
        self._draft_sampled = draft_step_sampled
        self._verify_sampled = verify_step_sampled
        self._accept = accept_fn
        self._key = jax.random.PRNGKey(0)
        self.stats = SpecStats()

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int = 32,
        eos_id: Optional[int] = None,
        sampling: Optional[SamplingParams | Sequence[SamplingParams]] = None,
    ) -> list[list[int]]:
        """Generate greedily (``sampling=None``) or by speculative
        sampling: pass one SamplingParams for the whole batch or one per
        prompt. The sampled stream is distributed exactly as target-model
        sampling and is deterministic per request seed. Repetition/
        presence/frequency penalties are not supported here (the verify
        path does not track output counts)."""
        if sampling is not None:
            _slist = (
                sampling if isinstance(sampling, (list, tuple)) else [sampling]
            )
            if any(s.has_penalties for s in _slist):
                raise ValueError(
                    "penalties are not supported by speculative decoding; "
                    "use PagedEngine or ContinuousBatchingEngine"
                )
        b = self.batch_size
        if len(prompts) > b:
            raise ValueError(f"{len(prompts)} prompts > batch_size {b}")
        k = self.k
        sampled = sampling is not None
        if sampled:
            if isinstance(sampling, SamplingParams):
                sampling = [sampling] * len(prompts)
            if len(sampling) != len(prompts):
                raise ValueError(
                    f"{len(sampling)} sampling params for {len(prompts)} prompts"
                )
            temp = np.zeros((b,), np.float32)
            top_k = np.zeros((b,), np.int32)
            top_p = np.ones((b,), np.float32)
            seeds = np.zeros((b,), np.int32)
            for i, sp in enumerate(sampling):
                temp[i], top_k[i], top_p[i], seeds[i] = (
                    sp.temperature, sp.top_k, sp.top_p, sp.seed
                )
            temp_j, top_k_j, top_p_j, seeds_j = map(
                jnp.asarray, (temp, top_k, top_p, seeds)
            )
            gen = np.zeros((b,), np.int32)  # tokens sampled so far per slot
        plen = max(len(p) for p in prompts)
        bucket = 16
        while bucket < plen:
            bucket *= 2
        if bucket + max_new_tokens + k + 1 <= self.max_len:
            plen = bucket
        toks = np.full((b, plen), self.pad_id, np.int32)
        offsets = np.full((b,), plen, np.int32)
        for i, p in enumerate(prompts):
            toks[i, plen - len(p):] = p
            offsets[i] = plen - len(p)
        offsets_j = jnp.asarray(offsets)

        t_cache = self.init_cache(self.target_config, b, self.max_len)
        d_cache = self.init_cache(self.draft_config, b, self.max_len)
        if sampled:
            first, t_cache = self._prefill_t_sampled(
                self.target_params, jnp.asarray(toks), t_cache, offsets_j,
                self._key, seeds_j, temp_j, top_k_j, top_p_j,
            )
            gen[:] = 1
        else:
            first, t_cache = self._prefill_t(
                self.target_params, jnp.asarray(toks), t_cache, offsets_j
            )
        d_cache = self._prefill_d(
            self.draft_params, jnp.asarray(toks), d_cache, offsets_j
        )

        out = [list() for _ in range(b)]
        done = np.zeros((b,), bool)
        done[len(prompts):] = True
        # per-slot stop sets (SamplingParams.stop_token_ids; eos_id is the
        # engine-wide equivalent)
        if sampling is None:
            stops = [frozenset()] * b
        else:
            slist = (
                list(sampling) if isinstance(sampling, (list, tuple))
                else [sampling] * len(prompts)
            )
            stops = [frozenset(s.stop_token_ids) for s in slist]
            stops += [frozenset()] * (b - len(stops))
        # last emitted (not yet consumed) token per slot, and the cache
        # slot it will be written to on the next forward of each model
        last = np.asarray(first).copy()  # [B]
        for i in range(len(prompts)):
            t0 = int(last[i])
            if (eos_id is not None and t0 == eos_id) or t0 in stops[i]:
                done[i] = True
            elif not done[i]:
                out[i].append(t0)
        t_pos = np.full((b,), plen, np.int32)
        d_pos = np.full((b,), plen, np.int32)
        # straggler the draft hasn't consumed yet (bonus rounds leave one);
        # -1 = none
        pending = np.full((b,), -1, np.int32)

        while not done.all():
            # cache-capacity guard: a verify round writes through pos+k
            if int(t_pos.max()) + k + 1 > self.max_len:
                break

            # -- draft catch-up after bonus rounds ------------------------
            if (pending >= 0).any():
                # one T=1 cache fill: bonus slots consume their straggler
                # at d_pos and advance; other slots are fed a duplicate
                # whose junk K/V at d_pos is overwritten by their very
                # next draft write (same slot) before it is attendable
                has = pending >= 0
                tok = np.where(has, pending, last).astype(np.int32)
                d_cache = self._fill_d(
                    self.draft_params, jnp.asarray(tok[:, None]), d_cache,
                    jnp.asarray(d_pos), offsets_j,
                )
                d_pos = d_pos + has.astype(np.int32)
                pending[:] = -1

            # -- draft phase: k sequential T=1 proposals ------------------
            proposals = np.zeros((b, k), np.int32)
            q_steps = []  # sampled mode: per-step warped draft dists (device)
            tok = jnp.asarray(last[:, None])
            for j in range(k):
                if sampled:
                    nxt, q_j, d_cache = self._draft_sampled(
                        self.draft_params, tok, d_cache,
                        jnp.asarray(d_pos + j), offsets_j,
                        self._key, seeds_j, jnp.asarray(gen + j),
                        temp_j, top_k_j, top_p_j,
                    )
                    q_steps.append(q_j)
                else:
                    nxt, d_cache = self._draft(
                        self.draft_params, tok, d_cache,
                        jnp.asarray(d_pos + j), offsets_j,
                    )
                proposals[:, j] = np.asarray(nxt)
                tok = nxt[:, None]
            # draft consumed [last, p_0 .. p_{k-2}] at slots d_pos..d_pos+k-1

            # -- verify phase: one T=k+1 target forward ------------------
            verify_in = np.concatenate([last[:, None], proposals], axis=1)
            if sampled:
                p_probs, t_cache = self._verify_sampled(
                    self.target_params, jnp.asarray(verify_in), t_cache,
                    jnp.asarray(t_pos), offsets_j,
                    temp_j, top_k_j, top_p_j,
                )
                a_vec, corr_vec, bonus_vec = self._accept(
                    self._key, seeds_j, jnp.asarray(gen),
                    jnp.asarray(proposals),
                    p_probs, jnp.stack(q_steps, axis=1),
                )
                a_vec = np.asarray(a_vec)
                corr_vec = np.asarray(corr_vec)
                bonus_vec = np.asarray(bonus_vec)
            else:
                greedy, t_cache = self._verify(
                    self.target_params, jnp.asarray(verify_in), t_cache,
                    jnp.asarray(t_pos), offsets_j,
                )
                greedy = np.asarray(greedy)  # [B, k+1]

            # -- acceptance bookkeeping (host) ----------------------------
            for i in range(len(prompts)):
                if done[i]:
                    continue
                if sampled:
                    a = int(a_vec[i])
                    correction = int(corr_vec[i])
                    bonus_tok = int(bonus_vec[i])
                else:
                    a = 0
                    while a < k and proposals[i, a] == greedy[i, a]:
                        a += 1
                    correction = int(greedy[i, min(a, k - 1)])
                    bonus_tok = int(greedy[i, k])
                self.stats.proposed += k
                self.stats.accepted += a
                if a < k:
                    emitted = list(proposals[i, :a]) + [correction]
                    last[i] = correction
                    t_pos[i] += a + 1
                    d_pos[i] += a + 1
                else:
                    # full acceptance: emit the verify forward's k+1-th
                    # token too; the draft still owes x_{k-1}, consumed by
                    # next round's catch-up fill (see module doc)
                    emitted = list(proposals[i, :k]) + [bonus_tok]
                    pending[i] = int(proposals[i, k - 1])
                    last[i] = bonus_tok
                    t_pos[i] += k + 1
                    d_pos[i] += k
                    self.stats.bonus += 1
                if sampled:
                    gen[i] += a + 1 if a < k else k + 1
                for t in emitted:
                    if len(out[i]) >= max_new_tokens:
                        done[i] = True
                        break
                    if (eos_id is not None and t == eos_id) or t in stops[i]:
                        done[i] = True
                        break
                    out[i].append(int(t))
                if len(out[i]) >= max_new_tokens:
                    done[i] = True
            self.stats.rounds += 1

        return [o[:max_new_tokens] for o in out[: len(prompts)]]
