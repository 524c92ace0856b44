"""Continuous batching: slot-based scheduler over a fixed-shape decode step.

The reference rides vLLM's continuous batching (SURVEY §3.3); a standalone
TPU framework owns it. TPU-first design constraints shape everything:

  * shapes never change — B decode slots and a [L, B, S, H, D] cache are
    allocated once; admission/retirement toggles a mask, never a shape;
  * one compiled decode step serves every population of slots (inactive
    slots compute garbage that is masked on the host);
  * per-slot prefill runs at batch 1 with prompt lengths bucketed to
    powers of two, bounding compilation count to O(log max_len); the
    freshly prefixed K/V block is spliced into the big cache with a
    dynamic_update_slice;
  * per-sequence cache positions ride the [B]-vector ``pos`` path of
    llama.forward (vmap'd cache scatter).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu.models import llama


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _warp_logits(logits, temperature, top_k, top_p):
    """Apply temperature / top-k / nucleus filters to one [V] logits row,
    returning warped logits whose softmax IS the sampling distribution.
    temperature <= 0 collapses to a one-hot mass at the unwarped argmax
    (greedy as the zero-temperature limit); top_k <= 0 and top_p >= 1
    disable those filters. Shared by per-slot sampling (_sample_row) and
    speculative sampling (serving/speculative.py), which needs the same
    warp applied to draft and target distributions for its acceptance
    rule to preserve the target distribution exactly."""
    v = logits.shape[-1]
    greedy = temperature <= 0.0
    t = jnp.where(greedy, 1.0, temperature)
    lg = logits / t
    sorted_desc = jnp.sort(lg)[::-1]
    kth = sorted_desc[jnp.clip(top_k - 1, 0, v - 1)]
    lg = jnp.where((top_k > 0) & (lg < kth), -jnp.inf, lg)
    # nucleus: smallest prefix of the sorted distribution reaching top_p
    sorted_f = jnp.sort(lg)[::-1]
    probs = jax.nn.softmax(sorted_f)
    cum = jnp.cumsum(probs)
    cutoff_idx = jnp.sum(cum < top_p)
    cutoff = sorted_f[jnp.clip(cutoff_idx, 0, v - 1)]
    lg = jnp.where((top_p < 1.0) & (lg < cutoff), -jnp.inf, lg)
    onehot = jnp.where(
        jnp.arange(v) == jnp.argmax(logits), 0.0, -jnp.inf
    )
    return jnp.where(greedy, onehot, lg)


def _sample_row(key, logits, temperature, top_k, top_p):
    """Per-slot sampling with runtime parameters (vmapped across slots so
    one compiled decode step serves mixed per-request settings — the role
    of vLLM's per-sequence SamplingParams). temperature <= 0 means greedy;
    top_k <= 0 and top_p >= 1 disable those filters."""
    lg = _warp_logits(logits, temperature, top_k, top_p)
    # categorical on the greedy one-hot row returns its single finite
    # entry, so one code path serves both modes; the key is consumed
    # identically to the pre-refactor code (same sampled streams)
    return jax.random.categorical(key, lg).astype(jnp.int32)


_sample_slots = jax.vmap(_sample_row)


def _apply_penalties_row(logits, pcounts, ocounts, pres, freq, rep):
    """vLLM-order per-request penalties on one [V] logits row, BEFORE the
    temperature/top-k/top-p warp: repetition_penalty divides positive /
    multiplies negative logits of tokens seen in prompt+output;
    presence_penalty subtracts once per seen output token;
    frequency_penalty subtracts per output occurrence. Defaults
    (rep=1, pres=0, freq=0) are an exact identity — one compiled decode
    step serves penalized and plain requests alike."""
    seen_any = (pcounts + ocounts) > 0
    r = jnp.where(rep > 0, rep, 1.0)
    lg = jnp.where(
        seen_any, jnp.where(logits > 0, logits / r, logits * r), logits
    )
    oc = ocounts.astype(lg.dtype)
    return lg - freq * oc - pres * (ocounts > 0).astype(lg.dtype)


_apply_penalties = jax.vmap(_apply_penalties_row)


@dataclasses.dataclass
class SamplingParams:
    """Per-request sampling controls (greedy by default).

    ``stop_token_ids``: extra per-request stop tokens (vLLM's
    SamplingParams.stop_token_ids) — generation finishes when one is
    produced, in addition to the engine-wide ``eos_id``; like eos, the
    stop token itself is not emitted."""

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0
    stop_token_ids: tuple = ()
    # vLLM-parity penalties (defaults are exact no-ops): repetition over
    # prompt+output tokens; presence/frequency over output tokens only
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0

    def __post_init__(self):
        self.stop_token_ids = tuple(self.stop_token_ids)

    @property
    def has_penalties(self) -> bool:
        return (
            self.repetition_penalty != 1.0
            or self.presence_penalty != 0.0
            or self.frequency_penalty != 0.0
        )


@dataclasses.dataclass
class _Request:
    rid: int
    prompt: list
    max_new_tokens: int
    sampling: SamplingParams = dataclasses.field(default_factory=SamplingParams)
    out: list = dataclasses.field(default_factory=list)
    # log p(token) under the raw model distribution (log-softmax of the
    # unwarped logits), parallel to ``out`` — the OpenAI "logprobs" field
    logprobs: list = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class ContinuousBatchingEngine:
    """Greedy continuous-batching decode over a fixed slot grid."""

    params: Any
    config: Any
    forward: Callable = llama.forward
    init_cache: Callable = llama.init_cache
    num_slots: int = 8
    max_len: int = 1024
    eos_id: Optional[int] = None
    pad_id: int = 0
    # Prompts longer than this prefill in fixed-size chunks, bounding
    # per-admission latency and compile count (None = whole-bucket prefill).
    prefill_chunk: Optional[int] = None
    # Block-granular exact prefix cache: K/V of complete ``prefix_block``-
    # token blocks of recent prompts are kept (up to this many blocks,
    # LRU); an admission splices the longest contiguous run of cached
    # blocks and prefills only the rest, so prompts sharing a system
    # prefix but diverging later still reuse the shared blocks (0 = off).
    # Exact: RoPE'd K is position-absolute, keys are raw token tuples
    # (no hash collisions). Role of vLLM's block-hash prefix caching.
    prefix_cache_entries: int = 0
    prefix_block: int = 64
    # Called as token_callback(rid, token) after every generated token —
    # the streaming hook the HTTP server uses.
    token_callback: Optional[Callable[[int, int], None]] = None
    # Tensor-parallel serving (see Engine.mesh): a Mesh with a "tp" axis
    # shard_maps every compiled step; params get sharded in __post_init__.
    mesh: Any = None
    params_specs: Any = None

    def __post_init__(self):
        if self.mesh is not None:
            from flute_tpu.parallel import (
                llama_partition_specs,
                shard_params,
                tp_model_forward,
            )

            if self.params_specs is None:
                self.params_specs = llama_partition_specs(self.params)
            self.params = shard_params(self.params, self.mesh, self.params_specs)
            # every compiled step (decode, prefill buckets, chunk fns)
            # closes over self.forward — swap in the TP wrapper before any
            # of them are built
            self.forward = tp_model_forward(
                self.config, self.mesh, self.params_specs,
                base_forward=self.forward,
            )
        fwd = self.forward
        config = self.config

        import functools

        @functools.partial(jax.jit, donate_argnums=(2, 11))
        def decode_step(params, tokens, cache, pos_vec, key, gen_counts,
                        temp, top_k, top_p, seeds, pcounts, ocounts,
                        pres, freq, rep):
            logits, cache = fwd(params, config, tokens, cache, pos_vec)
            # randomness keyed on (request seed, tokens generated so far) —
            # never on the global engine step — so a request's sampled
            # output is deterministic per seed regardless of when it was
            # admitted or what shares the batch
            keys = jax.vmap(
                lambda s, c: jax.random.fold_in(jax.random.fold_in(key, s), c)
            )(seeds, gen_counts)
            row = logits[:, -1].astype(jnp.float32)
            pen = _apply_penalties(row, pcounts, ocounts, pres, freq, rep)
            nxt = _sample_slots(keys, pen, temp, top_k, top_p)
            # logprob is of the RAW model distribution (pre-penalty/warp)
            lp = jax.nn.log_softmax(row)[jnp.arange(row.shape[0]), nxt]
            ocounts = ocounts.at[jnp.arange(row.shape[0]), nxt].add(1)
            return nxt, lp, cache, ocounts

        @functools.partial(jax.jit, donate_argnums=(2, 5))
        def decode_step_greedy(params, tokens, cache, pos_vec,
                               pcounts, ocounts, pres, freq, rep):
            # fast path when every active slot is greedy: skips the per-slot
            # [V] sorts of the sampling program (penalties still apply —
            # identity at default params)
            logits, cache = fwd(params, config, tokens, cache, pos_vec)
            row = logits[:, -1].astype(jnp.float32)
            pen = _apply_penalties(row, pcounts, ocounts, pres, freq, rep)
            nxt = jnp.argmax(pen, axis=-1).astype(jnp.int32)
            lp = jax.nn.log_softmax(row)[jnp.arange(row.shape[0]), nxt]
            ocounts = ocounts.at[jnp.arange(row.shape[0]), nxt].add(1)
            return nxt, lp, cache, ocounts

        self._decode = decode_step
        self._decode_greedy = decode_step_greedy
        self._gen_count = np.zeros((self.num_slots,), np.int32)
        self._key = jax.random.PRNGKey(0)
        self._prefills = {}  # bucket -> jitted fn
        self._queue: deque[_Request] = deque()
        self._slots: list[Optional[_Request]] = [None] * self.num_slots
        self._pos = np.zeros((self.num_slots,), np.int32)
        self._last_tok = np.zeros((self.num_slots,), np.int32)
        self._temp = np.zeros((self.num_slots,), np.float32)
        self._top_k = np.zeros((self.num_slots,), np.int32)
        self._top_p = np.ones((self.num_slots,), np.float32)
        self._seeds = np.zeros((self.num_slots,), np.int32)
        self._pres = np.zeros((self.num_slots,), np.float32)
        self._freq = np.zeros((self.num_slots,), np.float32)
        self._rep = np.ones((self.num_slots,), np.float32)
        v = config.vocab_size
        self._pcounts = jnp.zeros((self.num_slots, v), jnp.int32)
        self._ocounts = jnp.zeros((self.num_slots, v), jnp.int32)
        # device-resident zero row: non-penalized admissions clear their
        # count rows without uploading a [V] array through the tunnel
        self._zero_bins = jnp.zeros((v,), jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def counts_clear(pc, oc, slot, pbins, first):
            pc = pc.at[slot].set(pbins)
            oc = oc.at[slot].set(
                jnp.zeros((v,), jnp.int32).at[first].set(1)
            )
            return pc, oc

        self._counts_clear = counts_clear
        self._cache = self.init_cache(config, self.num_slots, self.max_len)
        if self.mesh is not None:
            # place the slot cache on the mesh up front (heads over tp) so
            # the donated decode cache is in its steady-state layout from
            # step one instead of resharding on first entry
            from jax.sharding import NamedSharding, PartitionSpec as P

            leaf = NamedSharding(self.mesh, P(None, "tp", None, None))
            self._cache = jax.tree.map(
                lambda a: jax.device_put(a, leaf), self._cache
            )
        self._next_rid = 0
        self._finished: dict[int, list] = {}
        self.finished_logprobs: dict[int, list] = {}
        from collections import OrderedDict

        # key = tuple(prompt[:i*prefix_block]) -> K/V of block i only
        # (positions [(i-1)*B, i*B)); a lookup walks i = 1, 2, ... with
        # O(1) dict probes and splices the contiguous run from position 0
        self._prefix_store: "OrderedDict[tuple, dict]" = OrderedDict()
        self.prefix_hits = 0  # requests that reused >= 1 cached block
        self.prefix_block_hits = 0  # total blocks spliced

    # -- admission ---------------------------------------------------------

    def submit(
        self,
        prompt,
        max_new_tokens: int = 64,
        sampling: Optional[SamplingParams] = None,
        **sampling_kw,
    ) -> int:
        """Queue a request. Sampling params per request: pass a
        SamplingParams or temperature=/top_k=/top_p=/seed= keywords."""
        rid = self._next_rid
        self._next_rid += 1
        if sampling is None:
            sampling = SamplingParams(**sampling_kw)
        elif sampling_kw:
            raise ValueError("pass either sampling= or keyword params, not both")
        self._queue.append(
            _Request(rid, list(prompt), max_new_tokens, sampling=sampling)
        )
        return rid

    def _prefill_fn(self, bucket: int):
        if bucket in self._prefills:
            return self._prefills[bucket]
        fwd, config = self.forward, self.config

        @jax.jit
        def prefill(params, tokens, small_cache, offsets):
            logits, small_cache = fwd(
                params, config, tokens, small_cache, jnp.int32(0), offsets
            )
            return logits[:, -1].astype(jnp.float32), small_cache

        self._prefills[bucket] = prefill
        return prefill

    def _chunk_fn(self, key):
        """Jitted forward for one prefill chunk at a scalar position offset
        (right-padded remainder chunks read their logits at the last real
        token; junk K/V beyond the prompt is causally masked and then
        overwritten by decode before it can be attended)."""
        ck = ("chunk", key)
        if ck in self._prefills:
            return self._prefills[ck]
        fwd, config = self.forward, self.config

        @jax.jit
        def run_chunk(params, tokens, small_cache, pos):
            logits, small_cache = fwd(params, config, tokens, small_cache, pos)
            return logits.astype(jnp.float32), small_cache

        self._prefills[ck] = run_chunk
        return run_chunk

    def _sample_first(self, logits_row, sampling, raw_row=None):
        """Sample the first post-prefill token from ``logits_row`` (possibly
        penalty-adjusted) and compute its logprob under ``raw_row`` (the
        unadjusted model row; defaults to logits_row) — one device dispatch,
        no [V] host transfer on the hot path."""
        if "sample1" not in self._prefills:
            def _s1(key, row, raw, temp, top_k, top_p):
                tok = _sample_row(key, row, temp, top_k, top_p)
                lp = jax.nn.log_softmax(raw.astype(jnp.float32))[tok]
                return tok, lp

            self._prefills["sample1"] = jax.jit(_s1)
        # the prompt's first sampled token is generation index 0
        key = jax.random.fold_in(
            jax.random.fold_in(self._key, sampling.seed), 0
        )
        tok, lp = self._prefills["sample1"](
            key, logits_row,
            logits_row if raw_row is None else raw_row,
            jnp.float32(sampling.temperature),
            jnp.int32(sampling.top_k),
            jnp.float32(sampling.top_p),
        )
        return int(tok), float(lp)

    # -- prefix cache ------------------------------------------------------

    def _find_prefix(self, prompt: list) -> list:
        """Longest contiguous run of cached blocks covering a *proper*
        prefix of ``prompt`` (at least one token must remain to prefill for
        next-token logits). O(1) dict probe per block."""
        bs = self.prefix_block
        nblocks = (len(prompt) - 1) // bs
        hit = []
        for i in range(1, nblocks + 1):
            entry = self._prefix_store.get(tuple(prompt[: i * bs]))
            if entry is None:
                break  # splice must be contiguous from position 0
            hit.append(entry)
        return hit

    def _store_prefix(self, prompt: list, small_cache: dict, start: int,
                      plen: int) -> None:
        """Store every complete block of the prompt not already cached
        (small_cache holds the prompt's K/V at columns [start, start+plen),
        positions 0-based)."""
        bs = self.prefix_block
        for i in range(1, plen // bs + 1):
            key = tuple(prompt[: i * bs])
            if key in self._prefix_store:
                self._prefix_store.move_to_end(key)
                continue
            entry = {
                kv: [
                    jax.lax.dynamic_slice_in_dim(
                        s, start + (i - 1) * bs, bs, axis=2
                    )
                    for s in small_cache[kv]
                ]
                for kv in ("k", "v")
            }
            self._prefix_store[key] = entry
            while len(self._prefix_store) > self.prefix_cache_entries:
                self._prefix_store.popitem(last=False)  # LRU evict

    def _prefill_from_prefix(self, req: _Request, hit: list):
        """Splice the cached block run and prefill only the remainder
        (RoPE'd K is position-absolute, so reuse at the same positions is
        exact)."""
        self.prefix_hits += 1
        self.prefix_block_hits += len(hit)
        bs = self.prefix_block
        plen = len(req.prompt)
        p0 = len(hit) * bs
        rem = plen - p0
        rb = _bucket(rem)
        csize = _bucket(max(plen, p0 + rb))
        small_cache = self.init_cache(self.config, 1, csize)
        for bi, entry in enumerate(hit):
            self._prefix_store.move_to_end(
                tuple(req.prompt[: (bi + 1) * bs])
            )
            for kv in ("k", "v"):
                for li, block in enumerate(entry[kv]):
                    small_cache[kv][li] = jax.lax.dynamic_update_slice(
                        small_cache[kv][li],
                        block.astype(small_cache[kv][li].dtype),
                        (0, 0, bi * bs, 0),
                    )
        rtoks = np.full((1, rb), self.pad_id, np.int32)
        rtoks[0, :rem] = req.prompt[p0:]
        logits, small_cache = self._chunk_fn((csize, rb))(
            self.params, jnp.asarray(rtoks), small_cache, jnp.int32(p0)
        )
        return logits[0, rem - 1], small_cache, plen, 0

    def _prefill(self, req: _Request):
        """Run prefill for one request; returns (last_logits [V],
        small_cache, plen, start) — ``start`` is the K/V column where the
        sequence begins inside small_cache (left-pad offset or 0)."""
        plen = len(req.prompt)
        chunk = self.prefill_chunk

        if self.prefix_cache_entries:
            hit = self._find_prefix(req.prompt)
            if hit:
                out = self._prefill_from_prefix(req, hit)
                self._store_prefix(req.prompt, out[1], out[3], plen)
                return out

        if chunk is None or plen <= chunk:
            bucket = _bucket(plen)
            toks = np.full((1, bucket), self.pad_id, np.int32)
            toks[0, bucket - plen:] = req.prompt  # left-pad into the bucket
            offsets = jnp.asarray([bucket - plen], jnp.int32)
            small_cache = self.init_cache(self.config, 1, bucket)
            last, small_cache = self._prefill_fn(bucket)(
                self.params, jnp.asarray(toks), small_cache, offsets
            )
            start = bucket - plen
            if self.prefix_cache_entries:
                self._store_prefix(req.prompt, small_cache, start, plen)
            return last[0], small_cache, plen, start
        # chunked prefill: full chunks at exact positions, right-padded
        # remainder bucket at the tail
        full = (plen // chunk) * chunk
        rem = plen - full
        rb = _bucket(rem) if rem else 0
        csize = _bucket(max(plen, full + rb))
        small_cache = self.init_cache(self.config, 1, csize)
        prompt = np.asarray(req.prompt, np.int32)
        logits = None
        for c0 in range(0, full, chunk):
            logits, small_cache = self._chunk_fn((csize, chunk))(
                self.params, jnp.asarray(prompt[None, c0:c0 + chunk]),
                small_cache, jnp.int32(c0),
            )
        if rem:
            rtoks = np.full((1, rb), self.pad_id, np.int32)
            rtoks[0, :rem] = prompt[full:]
            logits, small_cache = self._chunk_fn((csize, rb))(
                self.params, jnp.asarray(rtoks), small_cache, jnp.int32(full)
            )
            last = logits[0, rem - 1]
        else:
            last = logits[0, -1]
        if self.prefix_cache_entries:
            self._store_prefix(req.prompt, small_cache, 0, plen)
        return last, small_cache, plen, 0

    def _admit(self):
        for slot in range(self.num_slots):
            if self._slots[slot] is not None or not self._queue:
                continue
            req = self._queue.popleft()
            last_logits, small_cache, plen, start = self._prefill(req)
            # Splice the prefilled K/V into this slot; the slot's sequence
            # occupies small_cache columns [start, start + plen).
            for key in ("k", "v"):
                for li, small in enumerate(small_cache[key]):
                    block = jax.lax.dynamic_slice_in_dim(
                        small, start, plen, axis=2
                    )  # [1, H, plen, D]
                    self._cache[key][li] = jax.lax.dynamic_update_slice(
                        self._cache[key][li],
                        block.astype(self._cache[key][li].dtype),
                        (slot, 0, 0, 0),
                    )
            raw_row = last_logits
            if req.sampling.has_penalties:
                pbins = np.zeros((self.config.vocab_size,), np.int32)
                np.add.at(pbins, np.asarray(req.prompt, np.int64), 1)
                # repetition penalty applies to the first draw too
                # (output counts are still empty)
                r = req.sampling.repetition_penalty or 1.0
                lrow = np.asarray(last_logits, np.float32).copy()
                seen = pbins > 0
                lrow[seen] = np.where(
                    lrow[seen] > 0, lrow[seen] / r, lrow[seen] * r
                )
                last_logits = jnp.asarray(lrow)
                pbins_dev = jnp.asarray(pbins)
            else:
                pbins_dev = self._zero_bins
            tok, first_lp = self._sample_first(
                last_logits, req.sampling, raw_row
            )
            self._pcounts, self._ocounts = self._counts_clear(
                self._pcounts, self._ocounts, jnp.int32(slot),
                pbins_dev, jnp.int32(tok),
            )
            self._slots[slot] = req
            self._pos[slot] = plen
            self._last_tok[slot] = tok
            self._gen_count[slot] = 1  # next decode draw is generation 1
            s = req.sampling
            self._temp[slot] = s.temperature
            self._top_k[slot] = s.top_k
            self._top_p[slot] = s.top_p
            self._seeds[slot] = s.seed
            self._pres[slot] = s.presence_penalty
            self._freq[slot] = s.frequency_penalty
            self._rep[slot] = s.repetition_penalty
            self._record(slot, tok, first_lp)

    # -- stepping ----------------------------------------------------------

    def _record(self, slot: int, tok: int, lp: float = None):
        req = self._slots[slot]
        if req is None:
            return
        stop = (
            self.eos_id is not None and tok == self.eos_id
        ) or tok in req.sampling.stop_token_ids
        if stop or req.done:
            req.done = True
        else:
            req.out.append(tok)
            if lp is not None:
                req.logprobs.append(lp)
            if self.token_callback is not None:
                self.token_callback(req.rid, tok)
        if (
            req.done
            or len(req.out) >= req.max_new_tokens
            or self._pos[slot] + 1 >= self.max_len
        ):
            req.done = True
            self._finished[req.rid] = req.out
            self.finished_logprobs[req.rid] = req.logprobs
            self._slots[slot] = None

    def step(self) -> bool:
        """Admit waiting requests, run one decode step for all active slots.
        Returns True while any work remains."""
        self._admit()
        active = [i for i, r in enumerate(self._slots) if r is not None]
        if not active:
            return bool(self._queue)
        tokens = jnp.asarray(self._last_tok[:, None])
        pos_vec = jnp.asarray(self._pos)
        pen_args = (
            self._pcounts, self._ocounts, jnp.asarray(self._pres),
            jnp.asarray(self._freq), jnp.asarray(self._rep),
        )
        if all(self._temp[i] <= 0 for i in active):
            nxt, lp, self._cache, self._ocounts = self._decode_greedy(
                self.params, tokens, self._cache, pos_vec, *pen_args
            )
        else:
            nxt, lp, self._cache, self._ocounts = self._decode(
                self.params, tokens, self._cache, pos_vec,
                self._key, jnp.asarray(self._gen_count),
                jnp.asarray(self._temp), jnp.asarray(self._top_k),
                jnp.asarray(self._top_p), jnp.asarray(self._seeds),
                *pen_args,
            )
        nxt_np = np.asarray(nxt)
        lp_np = np.asarray(lp)
        for slot in active:
            self._pos[slot] += 1
            self._gen_count[slot] += 1
            tok = int(nxt_np[slot])
            self._last_tok[slot] = tok
            self._record(slot, tok, float(lp_np[slot]))
        return bool(self._queue) or any(r is not None for r in self._slots)

    def run(self) -> dict[int, list]:
        """Drain the queue; returns {request_id: generated tokens}."""
        while self.step():
            pass
        out, self._finished = self._finished, {}
        return out
