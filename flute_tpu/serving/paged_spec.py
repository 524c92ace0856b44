"""Speculative decoding composed with the paged KV pool.

The reference's serving story is vLLM, where speculative decoding and
PagedAttention are one system (SURVEY §2.2 "vLLM integration"); this
module is that composition for the TPU engines: the *target* model lives
entirely in the block pool (`serving/paged.py`) while a small *draft*
model proposes k tokens per round from a dense per-slot cache.

Design notes (all TPU-first, static shapes):

  * **Paged multi-token verify** — the T=k+1 verify forward scatters all
    k+1 K/V entries into their (pool row, offset) homes, then runs ONE
    fused multi-query paged-attention kernel
    (`ops.paged_attention.paged_verify_attention`): slot b's query j
    attends ``lengths[b]+j+1`` positions (a per-row mask inside the
    kernel), so every pool block is DMA'd once for all k+1 queries —
    causality across the speculated run falls out of per-row lengths,
    with no dense cache materialization.
  * **Rejection junk stays in owned blocks**: verify writes k positions
    past the accepted point; admission therefore reserves
    ``blocks_needed(plen + budget + k + 1)`` (``_tail``), the junk lands
    in blocks the slot already owns, and the next verify overwrites it
    before it becomes attendable — prefix-shared (immutable) blocks are
    never written because writes start at ``lengths >= plen``.
  * **Draft cache is dense** — the draft is expected to be small (W2
    quantized, fewer layers); paging it would buy little and cost a
    second pool. Admission prefills the prompt into a [1, bucket]
    scratch and splices it into the draft's slot row.
  * **Greedy and sampled rounds share one code path**: the draft step
    computes both its argmax and a warped sample, selecting per slot on
    device; acceptance is per-slot on host — greedy slots accept by
    argmax match, sampled slots by the shared modified-rejection kernel
    (`speculative.make_accept_fn`), so a batch can mix greedy and
    sampled requests like every other engine here.
  * **Bonus token on full acceptance** with the same per-slot catch-up
    contract as the dense `SpeculativeEngine` (one T=1 draft cache-fill
    consuming the straggler; non-bonus slots get a duplicate whose junk
    write is overwritten before it is attendable).
  * Keys/counts are the engines' shared (request seed, tokens generated)
    scheme, so sampled output is deterministic per seed regardless of
    batch composition or acceptance history.

Llama and Gemma-2 families (auto-detected per side: the Gemma-2 verify
runs softcap + per-row sliding windows inside the fused kernel; a
Gemma-2 draft decodes through its own dense-cache forward). Target and
draft families are independent — what must match is the tokenizer/vocab.
Composes with tensor parallelism (``mesh=``, same contract as
PagedEngine): pools AND the draft's dense cache shard over KV heads,
the verify and every draft step run under shard_map with two psums per
block, and fused draft params must be rank-major permuted exactly like
the target's.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu.models import llama
from flute_tpu.serving.continuous import _warp_logits
from flute_tpu.serving.paged import PagedEngine
from flute_tpu.serving.speculative import SpecStats, make_accept_fn


@dataclasses.dataclass
class PagedSpeculativeEngine(PagedEngine):
    """PagedEngine with a draft model proposing k tokens per round.

    All PagedEngine capabilities carry over (block pool, prefix-block
    sharing, per-request sampling, chunked prefill, streaming callback);
    the decode loop is replaced by draft-propose / paged-verify rounds.
    """

    draft_params: Any = None
    draft_config: Any = None
    k: int = 4
    supports_penalties = False  # verify rounds do not track output counts

    def __post_init__(self):
        if self.draft_params is None or self.draft_config is None:
            raise ValueError("draft_params and draft_config are required")
        if self.k < 1:
            raise ValueError(f"k must be >= 1, got {self.k}")
        if hasattr(self.draft_config, "attn_logit_softcap"):
            from flute_tpu.models import gemma2 as _dfam
        else:
            _dfam = llama
        self._draft_family = _dfam
        super().__post_init__()
        self._tail = 1 + self.k  # verify writes k past the accepted point
        cols = 1
        while cols < self.max_len:
            cols *= 2
        self._d_cache = _dfam.init_cache(self.draft_config, self.num_slots, cols)
        self._dfwd = _dfam.forward
        if self.mesh is not None:
            # TP for the draft too: its params shard like the target's and
            # its dense forward runs under the same shard_map wrapper (pass
            # FUSED draft params already rank-major permuted, exactly like
            # the target's). The draft cache lives head-sharded from step
            # one so the donated decode caches stay in steady-state layout.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from flute_tpu.parallel import (
                llama_partition_specs,
                shard_params,
                tp_model_forward,
            )

            self._draft_specs = llama_partition_specs(self.draft_params)
            self.draft_params = shard_params(
                self.draft_params, self.mesh, self._draft_specs
            )
            self._dfwd = tp_model_forward(
                self.draft_config, self.mesh, self._draft_specs,
                base_forward=_dfam.forward,
            )
            csh = NamedSharding(self.mesh, P(None, "tp", None, None))
            self._d_cache = jax.tree.map(
                lambda a: jax.device_put(a, csh), self._d_cache
            )
        self._d_pos = np.zeros((self.num_slots,), np.int32)
        self._d_ready = np.zeros((self.num_slots,), bool)
        self._pending = np.full((self.num_slots,), -1, np.int32)
        self.stats = SpecStats()
        self._accept = make_accept_fn(self.k)
        self._build_spec_steps()

    # -- compiled speculative steps -----------------------------------------

    def _build_spec_steps(self):
        cfg = self.config
        dcfg = self.draft_config
        bs = self.block_size
        k = self.k
        t = k + 1
        dfwd = self._dfwd

        # one shared multi-token paged forward (serving/paged_fwd.py)
        # serves both this verify (logits at all k+1 positions) and the
        # parent's pool-backed chunked prefill
        from flute_tpu.serving.paged_fwd import make_paged_multitoken_forward

        mt_fwd = make_paged_multitoken_forward(cfg, bs)

        def paged_verify(params, kp, vp, tables, lengths, toks,
                         axis_name=None):
            return mt_fwd(params, kp, vp, tables, lengths, toks,
                          axis_name=axis_name)

        if self.mesh is not None:
            # same TP layout as the parent's T=1 decode: pools sharded over
            # KV heads, two psums per block, tables/lengths/toks/logits
            # replicated; the fused verify kernel is head-count-invariant
            # so each rank runs it unchanged on its shard
            from jax.sharding import PartitionSpec as P

            from flute_tpu.parallel.tp import get_shard_map

            base_verify = paged_verify
            pool_spec = [P(None, "tp", None, None)] * cfg.num_layers

            @functools.partial(
                get_shard_map(),
                mesh=self.mesh,
                in_specs=(self.params_specs, pool_spec, pool_spec,
                          P(), P(), P()),
                out_specs=(P(), pool_spec, pool_spec),
            )
            def paged_verify(params, kp, vp, tables, lengths, toks):
                return base_verify(
                    params, kp, vp, tables, lengths, toks, axis_name="tp"
                )

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def verify_greedy(params, kp, vp, tables, lengths, toks):
            logits, kp, vp = paged_verify(params, kp, vp, tables, lengths, toks)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), kp, vp

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def verify_mixed(params, kp, vp, tables, lengths, toks,
                         temp, top_k, top_p):
            logits, kp, vp = paged_verify(params, kp, vp, tables, lengths, toks)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tsafe = jnp.where(temp > 0, temp, 1.0)
            warped = jax.vmap(
                lambda rows, tt, tk, tp: jax.vmap(
                    lambda r: _warp_logits(r, tt, tk, tp)
                )(rows)
            )(logits.astype(jnp.float32), tsafe, top_k, top_p)
            return greedy, jax.nn.softmax(warped), kp, vp

        @functools.partial(jax.jit, donate_argnums=(2,))
        def draft_greedy(dparams, tok, dcache, pos_vec):
            logits, dcache = dfwd(dparams, dcfg, tok, dcache, pos_vec)
            return (
                jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32),
                dcache,
            )

        @functools.partial(jax.jit, donate_argnums=(2,))
        def draft_mixed(dparams, tok, dcache, pos_vec,
                        key, seeds, gen, temp, top_k, top_p):
            logits, dcache = dfwd(dparams, dcfg, tok, dcache, pos_vec)
            row = logits[:, -1].astype(jnp.float32)
            tsafe = jnp.where(temp > 0, temp, 1.0)
            warped = jax.vmap(_warp_logits)(row, tsafe, top_k, top_p)
            keys = jax.vmap(
                lambda s, c: jax.random.fold_in(jax.random.fold_in(key, s), c)
            )(seeds, gen)
            sampled = jax.vmap(jax.random.categorical)(keys, warped)
            greedy = jnp.argmax(row, axis=-1)
            nxt = jnp.where(temp > 0, sampled, greedy).astype(jnp.int32)
            return nxt, jax.nn.softmax(warped), dcache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def draft_fill(dparams, tok, dcache, pos_vec):
            # post-bonus catch-up: logits discarded
            _, dcache = dfwd(dparams, dcfg, tok, dcache, pos_vec)
            return dcache

        self._verify_greedy = verify_greedy
        self._verify_mixed = verify_mixed
        self._dstep_greedy = draft_greedy
        self._dstep_mixed = draft_mixed
        self._dfill = draft_fill

    def _draft_prefill_fn(self, tb: int):
        key = ("dprefill", tb)
        if key not in self._prefills:
            dcfg = self.draft_config
            dfwd = self._dfwd

            @jax.jit
            def dprefill(dparams, tokens, scratch):
                _, scratch = dfwd(dparams, dcfg, tokens, scratch, jnp.int32(0))
                return scratch

            self._prefills[key] = dprefill
        return self._prefills[key]

    def _draft_splice_fn(self, tb: int):
        key = ("dsplice", tb)
        if key not in self._prefills:
            nl = self.draft_config.num_layers

            @functools.partial(jax.jit, donate_argnums=(1,))
            def dsplice(scratch, dcache, slot):
                for li in range(nl):
                    for kv in ("k", "v"):
                        dcache[kv][li] = jax.lax.dynamic_update_slice(
                            dcache[kv][li],
                            scratch[kv][li].astype(dcache[kv][li].dtype),
                            (slot, 0, 0, 0),
                        )
                return dcache

            self._prefills[key] = dsplice
        return self._prefills[key]

    # -- admission / teardown hooks ------------------------------------------

    def _admit(self):
        super()._admit()
        # draft-prefill any slot the parent just admitted: the draft always
        # prefills the FULL prompt (it has no share in the pool prefix
        # cache); junk past plen in the spliced bucket is overwritten by
        # draft decode before it is ever attendable
        for s in range(self.num_slots):
            if self._slot_req[s] is None or self._d_ready[s]:
                continue
            prompt = self._slot_prompt[s]
            plen = len(prompt)
            tb = self.block_size
            while tb < plen:
                tb *= 2
            toks = np.full((1, tb), self.pad_id, np.int32)
            toks[0, :plen] = prompt
            scratch = self._draft_family.init_cache(self.draft_config, 1, tb)
            scratch = self._draft_prefill_fn(tb)(
                self.draft_params, jnp.asarray(toks), scratch
            )
            self._d_cache = self._draft_splice_fn(tb)(
                scratch, self._d_cache, jnp.int32(s)
            )
            self._d_pos[s] = plen
            self._pending[s] = -1
            self._d_ready[s] = True

    def _finish(self, slot: int):
        super()._finish(slot)
        self._d_ready[slot] = False
        self._pending[slot] = -1
        self._d_pos[slot] = 0

    # -- the speculative round ------------------------------------------------

    def step(self) -> bool:
        self._admit()
        active = [
            s for s in range(self.num_slots) if self._slot_req[s] is not None
        ]
        if not active:
            return bool(self._queue)
        k = self.k

        # draft catch-up after bonus rounds (see module doc)
        has = self._pending >= 0
        if has.any():
            tok = np.where(has, self._pending, self._last).astype(np.int32)
            self._d_cache = self._dfill(
                self.draft_params, jnp.asarray(tok[:, None]), self._d_cache,
                jnp.asarray(self._d_pos),
            )
            self._d_pos = (self._d_pos + has.astype(np.int32)).astype(np.int32)
            self._pending[:] = -1

        sampled_any = any(self._temp[s] > 0 for s in active)

        # -- draft phase: k sequential T=1 proposals --------------------------
        proposals = np.zeros((self.num_slots, k), np.int32)
        q_steps = []
        tok = jnp.asarray(self._last[:, None])
        for j in range(k):
            pos = jnp.asarray(self._d_pos + j)
            if sampled_any:
                nxt, q_j, self._d_cache = self._dstep_mixed(
                    self.draft_params, tok, self._d_cache, pos,
                    self._key, jnp.asarray(self._seeds),
                    jnp.asarray(self._gen_count + j),
                    jnp.asarray(self._temp), jnp.asarray(self._top_k),
                    jnp.asarray(self._top_p),
                )
                q_steps.append(q_j)
            else:
                nxt, self._d_cache = self._dstep_greedy(
                    self.draft_params, tok, self._d_cache, pos
                )
            proposals[:, j] = np.asarray(nxt)
            tok = nxt[:, None]

        # -- verify phase: one paged T=k+1 target forward ----------------------
        verify_in = np.concatenate([self._last[:, None], proposals], axis=1)
        if sampled_any:
            greedy_v, p_probs, self._kp, self._vp = self._verify_mixed(
                self.params, self._kp, self._vp, jnp.asarray(self._tables),
                jnp.asarray(self._lengths), jnp.asarray(verify_in),
                jnp.asarray(self._temp), jnp.asarray(self._top_k),
                jnp.asarray(self._top_p),
            )
            a_vec, corr_vec, bonus_vec = self._accept(
                self._key, jnp.asarray(self._seeds),
                jnp.asarray(self._gen_count), jnp.asarray(proposals),
                p_probs, jnp.stack(q_steps, axis=1),
            )
            a_vec = np.asarray(a_vec)
            corr_vec = np.asarray(corr_vec)
            bonus_vec = np.asarray(bonus_vec)
        else:
            greedy_v, self._kp, self._vp = self._verify_greedy(
                self.params, self._kp, self._vp, jnp.asarray(self._tables),
                jnp.asarray(self._lengths), jnp.asarray(verify_in),
            )
        greedy_v = np.asarray(greedy_v)

        # -- per-slot acceptance (host) ----------------------------------------
        for s in active:
            if self._temp[s] > 0:
                a = int(a_vec[s])
                correction = int(corr_vec[s])
                bonus_tok = int(bonus_vec[s])
            else:
                a = 0
                while a < k and proposals[s, a] == greedy_v[s, a]:
                    a += 1
                correction = int(greedy_v[s, min(a, k - 1)])
                bonus_tok = int(greedy_v[s, k])
            self.stats.proposed += k
            self.stats.accepted += a
            if a < k:
                emitted = list(proposals[s, :a]) + [correction]
                self._lengths[s] += a + 1
                self._d_pos[s] += a + 1
            else:
                emitted = list(proposals[s, :k]) + [bonus_tok]
                self._lengths[s] += k + 1
                self._d_pos[s] += k
                self._pending[s] = int(proposals[s, k - 1])
                self.stats.bonus += 1
            self._gen_count[s] += len(emitted)
            for tkn in emitted:
                self._record(s, int(tkn))
                if self._slot_req[s] is None:
                    break  # eos / budget hit mid-run (also resets pending)
        self.stats.rounds += 1
        return True
