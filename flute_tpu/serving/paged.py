"""Paged KV-cache serving: block-pool memory + paged-attention decode.

The reference's serving memory system is vLLM's PagedAttention: K/V blocks
allocated from a shared pool, per-sequence block tables, no B x max_len
over-allocation (SURVEY §2.2 "vLLM integration" — the capability a vLLM
user expects from the serving layer). TPU-native realization:

  * pools are per-layer ``[num_blocks, Hkv, block, D]`` arrays; block
    tables/lengths are shared across layers (one logical block maps to
    the same pool row in every layer — vLLM's layout);
  * the decode step is one jitted T=1 forward whose attention is the
    scalar-prefetch Pallas kernel (`ops/paged_attention.py`) — the block
    gather happens in the kernel's DMA, never as a dense HBM cache;
  * allocation/free is a host-side free list: admission takes blocks,
    completion returns them. HBM cost is sum(ceil(len_i/block)) blocks,
    not num_slots x max_len;
  * prefill runs the dense `llama.forward` into a per-request bucketed
    scratch cache (prefill is compute-bound; paging buys nothing there)
    and the K/V blocks are then scattered into the pool — the same
    splice pattern as the block prefix cache (serving/continuous.py).

Greedy decode only, llama-family models (Gemma-2's softcaps/sliding
window would need kernel variants; ROADMAP "Serving").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu.models import llama
from flute_tpu.models.llama import (
    apply_linear,
    apply_rope,
    rms_norm,
    rope_tables,
    split_fused_qkv,
)
from flute_tpu.ops.paged_attention import paged_decode_attention


@dataclasses.dataclass
class PagedEngine:
    """Slot-based greedy engine over a paged KV pool.

    ``num_blocks`` bounds total cached tokens (num_blocks * block_size),
    decoupled from ``num_slots * max_len`` — the memory win over the
    dense-cache engines when sequence lengths are heterogeneous.
    """

    params: Any
    config: Any
    num_slots: int = 8
    block_size: int = 16
    num_blocks: int = 64
    max_len: int = 512  # per-sequence logical cap (table width)
    pad_id: int = 0
    eos_id: Optional[int] = None

    def __post_init__(self):
        cfg = self.config
        bs = self.block_size
        if self.max_len % bs:
            raise ValueError(f"max_len {self.max_len} % block {bs} != 0")
        self.max_blocks = self.max_len // bs
        shape = (self.num_blocks, cfg.num_kv_heads, bs, cfg.head_dim)
        self._kp = [jnp.zeros(shape, cfg.dtype) for _ in range(cfg.num_layers)]
        self._vp = [jnp.zeros(shape, cfg.dtype) for _ in range(cfg.num_layers)]
        self._tables = np.zeros((self.num_slots, self.max_blocks), np.int32)
        self._lengths = np.zeros((self.num_slots,), np.int32)
        # block 0 is the trash block: inactive slots' table rows point at
        # it (length 0, fully masked), so their junk writes can never land
        # in a block that has been reallocated to a live sequence
        self._free = list(range(self.num_blocks - 1, 0, -1))
        self._slot_blocks: list[list[int]] = [[] for _ in range(self.num_slots)]
        self._slot_req: list[Optional[int]] = [None] * self.num_slots
        self._budget: dict[int, int] = {}
        self._out: dict[int, list] = {}
        self._last = np.zeros((self.num_slots,), np.int32)
        self._queue: list = []
        self._next_rid = 0
        self._build_steps()

    # -- compiled steps ----------------------------------------------------

    def _build_steps(self):
        cfg = self.config
        bs = self.block_size

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def decode_step(params, kp, vp, tables, lengths, tokens):
            """One paged T=1 greedy step for every slot (inactive slots
            compute on junk at their frozen position — harmless, masked by
            the host-side slot bookkeeping)."""
            b = tokens.shape[0]
            x = params["embed"][tokens].astype(cfg.dtype)  # [B, 1, hid]
            positions = lengths[:, None]  # [B, 1] rope position = length
            cos, sin = rope_tables(cfg, positions)
            d = cfg.head_dim
            rows = tables[jnp.arange(b), lengths // bs]  # [B] pool rows
            offs = lengths % bs  # [B]
            att_len = lengths + 1

            new_kp, new_vp = [], []
            for li, layer in enumerate(params["layers"]):
                h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
                if "qkv" in layer:
                    qkv = apply_linear(layer["qkv"], h)
                    q, k, v = split_fused_qkv(
                        qkv, cfg.num_heads, cfg.num_kv_heads, d
                    )
                else:
                    q = apply_linear(layer["q"], h).reshape(b, 1, -1, d)
                    k = apply_linear(layer["k"], h).reshape(b, 1, -1, d)
                    v = apply_linear(layer["v"], h).reshape(b, 1, -1, d)
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
                # scatter this token's K/V into (pool row, offset) per slot
                kpl = kp[li].at[rows, :, offs, :].set(
                    k[:, 0].astype(kp[li].dtype)
                )
                vpl = vp[li].at[rows, :, offs, :].set(
                    v[:, 0].astype(vp[li].dtype)
                )
                attn = paged_decode_attention(
                    q[:, 0], kpl, vpl, tables, att_len
                )
                o = apply_linear(layer["o"], attn.reshape(b, 1, -1))
                x = x + o
                h2 = rms_norm(x, layer["mlp_norm"], cfg.rms_norm_eps)
                if "gate_up" in layer:
                    gu = apply_linear(layer["gate_up"], h2)
                    inter = gu.shape[-1] // 2
                    gate, up = gu[..., :inter], gu[..., inter:]
                else:
                    gate = apply_linear(layer["gate"], h2)
                    up = apply_linear(layer["up"], h2)
                down = apply_linear(
                    layer["down"], jax.nn.silu(gate) * up
                )
                x = x + down
                new_kp.append(kpl)
                new_vp.append(vpl)

            x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
            head = (
                params["lm_head"]
                if params.get("lm_head") is not None
                else params["embed"].T
            )
            from flute_tpu.nn import QuantizedLinear

            if isinstance(head, QuantizedLinear):
                logits = head(x)[..., : cfg.vocab_size]
            else:
                logits = jnp.dot(
                    x, head.astype(x.dtype),
                    preferred_element_type=jnp.float32,
                )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return nxt, new_kp, new_vp

        self._decode = decode_step
        self._prefills: dict = {}

    def _prefill_fn(self, bucket: int):
        if bucket not in self._prefills:
            cfg = self.config

            @jax.jit
            def prefill(params, tokens, small_cache):
                logits, small_cache = llama.forward(
                    params, cfg, tokens, small_cache, jnp.int32(0)
                )
                # right-padded prompt: the caller reads position plen-1
                return (
                    jnp.argmax(logits, axis=-1).astype(jnp.int32),
                    small_cache,
                )

            self._prefills[bucket] = prefill
        return self._prefills[bucket]

    # -- admission / bookkeeping ------------------------------------------

    def submit(self, prompt: Sequence[int], max_new_tokens: int = 32) -> int:
        if len(prompt) + max_new_tokens + 1 > self.max_len:
            raise ValueError(
                f"prompt {len(prompt)} + budget {max_new_tokens} exceeds "
                f"max_len {self.max_len}"
            )
        need = self._blocks_needed(len(prompt) + max_new_tokens + 1)
        if need > self.num_blocks - 1:
            raise ValueError(
                f"request needs {need} blocks; pool has {self.num_blocks - 1}"
            )
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append((rid, list(prompt), max_new_tokens))
        return rid

    def _blocks_needed(self, total_len: int) -> int:
        return -(-total_len // self.block_size)

    def _admit(self):
        for slot in range(self.num_slots):
            if self._slot_req[slot] is not None or not self._queue:
                continue
            rid, prompt, budget = self._queue[0]
            plen = len(prompt)
            need = self._blocks_needed(plen + budget + 1)
            if len(self._free) < need:
                return  # pool pressure: wait for a slot to free
            self._queue.pop(0)
            blocks = [self._free.pop() for _ in range(need)]
            self._slot_blocks[slot] = blocks
            self._tables[slot, :] = 0
            self._tables[slot, : len(blocks)] = blocks
            self._slot_req[slot] = rid
            self._budget[rid] = budget
            self._out[rid] = []

            # dense prefill into a bucketed scratch cache, then scatter
            # whole blocks into the pool
            bucket = self.block_size
            while bucket < plen:
                bucket *= 2
            scratch = llama.init_cache(self.config, 1, bucket)
            toks = np.full((1, bucket), self.pad_id, np.int32)
            toks[0, :plen] = prompt
            # right-pad: junk tail K/V is causally masked during prefill
            # and lives past `lengths`, so paged attention never sees it
            greedy_all, scratch = self._prefill_fn(bucket)(
                self.params, jnp.asarray(toks), scratch
            )
            first = np.asarray(greedy_all)[0, plen - 1]
            bs = self.block_size
            for bi in range(self._blocks_needed(plen)):
                row = blocks[bi]
                for li in range(self.config.num_layers):
                    kblk = jax.lax.dynamic_slice_in_dim(
                        scratch["k"][li], bi * bs, bs, axis=2
                    )[0]
                    vblk = jax.lax.dynamic_slice_in_dim(
                        scratch["v"][li], bi * bs, bs, axis=2
                    )[0]
                    self._kp[li] = self._kp[li].at[row].set(
                        kblk.astype(self._kp[li].dtype)
                    )
                    self._vp[li] = self._vp[li].at[row].set(
                        vblk.astype(self._vp[li].dtype)
                    )
            self._lengths[slot] = plen
            self._record(slot, int(first))

    def _record(self, slot: int, tok: int):
        rid = self._slot_req[slot]
        if self.eos_id is not None and tok == self.eos_id:
            self._finish(slot)
            return
        self._out[rid].append(tok)
        self._last[slot] = tok
        if len(self._out[rid]) >= self._budget[rid]:
            self._finish(slot)

    def _finish(self, slot: int):
        self._free.extend(reversed(self._slot_blocks[slot]))
        self._slot_blocks[slot] = []
        self._slot_req[slot] = None
        # park the slot on the trash block at length 0 so its junk decode
        # writes stay out of live blocks
        self._tables[slot, :] = 0
        self._lengths[slot] = 0

    @property
    def blocks_in_use(self) -> int:
        """Allocated blocks (excluding the reserved trash block)."""
        return self.num_blocks - 1 - len(self._free)

    def step(self) -> bool:
        self._admit()
        active = [s for s in range(self.num_slots) if self._slot_req[s] is not None]
        if not active:
            return bool(self._queue)
        nxt, self._kp, self._vp = self._decode(
            self.params, self._kp, self._vp,
            jnp.asarray(self._tables), jnp.asarray(self._lengths),
            jnp.asarray(self._last[:, None]),
        )
        nxt = np.asarray(nxt)
        for s in active:
            self._lengths[s] += 1
            self._record(s, int(nxt[s]))
        return True

    def run(self) -> dict[int, list]:
        while self.step():
            pass
        out, self._out = self._out, {}
        return out
