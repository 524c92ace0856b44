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


@dataclasses.dataclass
class _Request:
    rid: int
    prompt: list
    max_new_tokens: int
    out: list = dataclasses.field(default_factory=list)
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

    def __post_init__(self):
        fwd = self.forward
        config = self.config

        import functools

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_step(params, tokens, cache, pos_vec):
            logits, cache = fwd(params, config, tokens, cache, pos_vec)
            return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

        self._decode = decode_step
        self._prefills = {}  # bucket -> jitted fn
        self._queue: deque[_Request] = deque()
        self._slots: list[Optional[_Request]] = [None] * self.num_slots
        self._pos = np.zeros((self.num_slots,), np.int32)
        self._last_tok = np.zeros((self.num_slots,), np.int32)
        self._cache = self.init_cache(config, self.num_slots, self.max_len)
        self._next_rid = 0
        self._finished: dict[int, list] = {}

    # -- admission ---------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int = 64) -> int:
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append(_Request(rid, list(prompt), max_new_tokens))
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
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return nxt, small_cache

        self._prefills[bucket] = prefill
        return prefill

    def _admit(self):
        for slot in range(self.num_slots):
            if self._slots[slot] is not None or not self._queue:
                continue
            req = self._queue.popleft()
            plen = len(req.prompt)
            bucket = _bucket(plen)
            toks = np.full((1, bucket), self.pad_id, np.int32)
            toks[0, bucket - plen:] = req.prompt  # left-pad into the bucket
            offsets = jnp.asarray([bucket - plen], jnp.int32)
            small_cache = self.init_cache(self.config, 1, bucket)
            nxt, small_cache = self._prefill_fn(bucket)(
                self.params, jnp.asarray(toks), small_cache, offsets
            )
            # Splice the prefilled K/V into this slot. The slot's sequence
            # occupies cache columns [0, plen): shift out the left padding.
            pad = bucket - plen
            for key in ("k", "v"):
                for li, small in enumerate(small_cache[key]):
                    block = jax.lax.dynamic_slice_in_dim(
                        small, pad, plen, axis=2
                    )  # [1, H, plen, D]
                    self._cache[key][li] = jax.lax.dynamic_update_slice(
                        self._cache[key][li],
                        block.astype(self._cache[key][li].dtype),
                        (slot, 0, 0, 0),
                    )
            tok = int(np.asarray(nxt)[0])
            self._slots[slot] = req
            self._pos[slot] = plen
            self._last_tok[slot] = tok
            self._record(slot, tok)

    # -- stepping ----------------------------------------------------------

    def _record(self, slot: int, tok: int):
        req = self._slots[slot]
        if req is None:
            return
        if (self.eos_id is not None and tok == self.eos_id) or req.done:
            req.done = True
        else:
            req.out.append(tok)
        if (
            req.done
            or len(req.out) >= req.max_new_tokens
            or self._pos[slot] + 1 >= self.max_len
        ):
            req.done = True
            self._finished[req.rid] = req.out
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
        nxt, self._cache = self._decode(self.params, tokens, self._cache, pos_vec)
        nxt_np = np.asarray(nxt)
        for slot in active:
            self._pos[slot] += 1
            tok = int(nxt_np[slot])
            self._last_tok[slot] = tok
            self._record(slot, tok)
        return bool(self._queue) or any(r is not None for r in self._slots)

    def run(self) -> dict[int, list]:
        """Drain the queue; returns {request_id: generated tokens}."""
        while self.step():
            pass
        out, self._finished = self._finished, {}
        return out
