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

Per-request sampling (temperature/top-k/top-p/seed) shares the
continuous engine's machinery: randomness is keyed on (request seed,
tokens generated), never the global step, so sampled output is
deterministic per seed regardless of batch composition. Llama and
Gemma-2 families: Gemma-2 configs are auto-detected and decode through
the paged kernel's softcap/sliding-window variants (out-of-window
blocks skip compute entirely).
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
from flute_tpu.serving.continuous import (
    SamplingParams,
    _apply_penalties,
    _sample_row,
    _sample_slots,
)


def _first_token_row(row: np.ndarray, prompt, sampling, vocab: int):
    """Host-side prep for the first draw after prefill: prompt bincount
    plus the repetition penalty over prompt tokens — presence/frequency
    act on output tokens, of which there are none yet. Returns (row for
    sampling, raw row for the logprob, pbins or None when unpenalized —
    callers then pass the device-resident zero row, avoiding a [V]
    upload per admission)."""
    if not sampling.has_penalties:
        return row, row, None
    pbins = np.zeros((vocab,), np.int32)
    np.add.at(pbins, np.asarray(prompt, np.int64), 1)
    r = sampling.repetition_penalty or 1.0
    raw = row
    row = row.copy()
    seen = pbins > 0
    row[seen] = np.where(row[seen] > 0, row[seen] / r, row[seen] * r)
    return row, raw, pbins


@dataclasses.dataclass
class PagedEngine:
    """Slot-based engine over a paged KV pool (greedy or per-request
    sampled decode).

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
    # dense-prefill hooks; Gemma-2 configs are auto-detected (softcap /
    # sliding-window paged decode) and swap these to the gemma2 module
    forward: Any = None
    init_cache: Any = None
    # called as token_callback(rid, token) after every generated token —
    # the streaming hook serving/server.py uses (same contract as
    # ContinuousBatchingEngine)
    token_callback: Any = None
    # Pool-level prefix caching (vLLM's hash-block sharing): full prompt
    # blocks are kept in the pool after a request finishes, keyed by their
    # exact token prefix, and *shared by reference* with later requests —
    # a hit costs zero HBM and zero prefill compute for the shared run.
    # Refcounts protect live blocks; unreferenced cached blocks are the
    # first evicted (LRU) under pool pressure. 0 = off.
    prefix_cache_blocks: int = 0
    # Tensor-parallel serving (same contract as ContinuousBatchingEngine):
    # a Mesh with a "tp" axis shard_maps the paged decode step (pools
    # sharded over KV heads, two psums per block) and the dense prefill;
    # params get sharded in __post_init__. Pass fused params already
    # rank-major permuted (parallel.permute_fused_params) — vLLM serves
    # PagedAttention + TP together; so does this engine.
    mesh: Any = None
    params_specs: Any = None
    # Prompts whose non-shared suffix exceeds this prefill in fixed-size
    # chunks (bounded per-admission latency; same contract as
    # ContinuousBatchingEngine.prefill_chunk). None = one bucketed call.
    prefill_chunk: Optional[int] = None
    # Engines that track per-token output counts support the vLLM-parity
    # penalties (repetition/presence/frequency); the speculative subclass
    # overrides this to False (its verify path does not maintain counts)
    supports_penalties = True
    # Pool-backed prefill (vLLM's unified path): prompt chunks are written
    # STRAIGHT into pool blocks and attend through the fused multi-query
    # paged kernel — no dense scratch cache, no splice/scatter dispatches,
    # and shared prefix blocks attend via the block table with zero
    # copies. Admission memory is bounded by one chunk (prefill_chunk,
    # default 256 here) regardless of prompt length. False keeps the
    # dense-scratch + scatter path.
    pool_prefill: bool = False

    def __post_init__(self):
        cfg = self.config
        # positions past a request's budgeted length that decode/verify may
        # transiently write: 1 here; 1 + k for the speculative subclass
        # (a verify round writes k ahead before acceptance rolls back)
        self._tail = 1
        self._is_gemma2 = hasattr(cfg, "attn_logit_softcap")
        if self.forward is None or self.init_cache is None:
            if self._is_gemma2:
                from flute_tpu.models import gemma2 as _family
            else:
                _family = llama
            self.forward = self.forward or _family.forward
            self.init_cache = self.init_cache or _family.init_cache
        if self.mesh is not None:
            from flute_tpu.parallel import (
                llama_partition_specs,
                shard_params,
                tp_model_forward,
            )

            if self.params_specs is None:
                self.params_specs = llama_partition_specs(self.params)
            self.params = shard_params(self.params, self.mesh, self.params_specs)
            # the dense-prefill path closes over self.forward — swap in the
            # TP wrapper before any prefill fn is built
            self.forward = tp_model_forward(
                cfg, self.mesh, self.params_specs, base_forward=self.forward
            )
        bs = self.block_size
        if self.max_len % bs:
            raise ValueError(f"max_len {self.max_len} % block {bs} != 0")
        self.max_blocks = self.max_len // bs
        shape = (self.num_blocks, cfg.num_kv_heads, bs, cfg.head_dim)
        self._kp = [jnp.zeros(shape, cfg.dtype) for _ in range(cfg.num_layers)]
        self._vp = [jnp.zeros(shape, cfg.dtype) for _ in range(cfg.num_layers)]
        if self.mesh is not None:
            # place pools head-sharded up front so the donated decode pools
            # are in steady-state layout from step one
            from jax.sharding import NamedSharding, PartitionSpec as P

            pool_sh = NamedSharding(self.mesh, P(None, "tp", None, None))
            self._kp = [jax.device_put(a, pool_sh) for a in self._kp]
            self._vp = [jax.device_put(a, pool_sh) for a in self._vp]
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
        self._out_lp: dict[int, list] = {}
        self.finished_logprobs: dict[int, list] = {}
        self._last = np.zeros((self.num_slots,), np.int32)
        self._temp = np.zeros((self.num_slots,), np.float32)
        self._top_k = np.zeros((self.num_slots,), np.int32)
        self._top_p = np.ones((self.num_slots,), np.float32)
        self._seeds = np.zeros((self.num_slots,), np.int32)
        self._stop: list[frozenset] = [frozenset()] * self.num_slots
        self._pres = np.zeros((self.num_slots,), np.float32)
        self._freq = np.zeros((self.num_slots,), np.float32)
        self._rep = np.ones((self.num_slots,), np.float32)
        v = cfg.vocab_size
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
        self._gen_count = np.zeros((self.num_slots,), np.int32)
        self._key = jax.random.PRNGKey(0)
        self._queue: list = []
        self._next_rid = 0
        self._finished: dict[int, list] = {}
        # prefix cache state: tuple(prompt[:i*bs]) -> pool row holding that
        # block's K/V (LRU order); refcount of live *readers* per pool row
        # (cached rows with refcount 0 are evictable)
        from collections import OrderedDict

        self._prefix_map: "OrderedDict[tuple, int]" = OrderedDict()
        self._refs = np.zeros((self.num_blocks,), np.int64)
        self._slot_shared: list[list[int]] = [[] for _ in range(self.num_slots)]
        self._slot_prompt: list[Optional[list]] = [None] * self.num_slots
        self.prefix_hits = 0  # requests that reused >= 1 cached block
        self.prefix_block_hits = 0  # total blocks shared by reference
        self._build_steps()

    # -- compiled steps ----------------------------------------------------

    def _build_steps(self):
        cfg = self.config
        bs = self.block_size

        def paged_forward_gemma2(
            params, kp, vp, tables, lengths, tokens, axis_name=None
        ):
            """Gemma-2 paged T=1 forward: sandwich norms, GeGLU, embed
            scaling, alternating sliding/global attention (softcap + window
            handled inside the paged kernel), final logit softcap."""
            from flute_tpu.models.gemma2 import rms_norm_gemma
            from flute_tpu.models.gemma2 import rope_tables as g2_rope

            b = tokens.shape[0]
            x = params["embed"][tokens].astype(cfg.dtype)
            x = x * jnp.asarray(cfg.hidden_size**0.5, cfg.dtype)
            positions = lengths[:, None]
            cos, sin = g2_rope(cfg, positions)
            d = cfg.head_dim
            rows = tables[jnp.arange(b), lengths // bs]
            offs = lengths % bs
            att_len = lengths + 1
            eps = cfg.rms_norm_eps

            new_kp, new_vp = [], []
            for li, layer in enumerate(params["layers"]):
                h = rms_norm_gemma(x, layer["attn_norm"], eps)
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
                kpl = kp[li].at[rows, :, offs, :].set(
                    k[:, 0].astype(kp[li].dtype)
                )
                vpl = vp[li].at[rows, :, offs, :].set(
                    v[:, 0].astype(vp[li].dtype)
                )
                attn = paged_decode_attention(
                    q[:, 0], kpl, vpl, tables, att_len,
                    scale=cfg.query_pre_attn_scalar**-0.5,
                    softcap=cfg.attn_logit_softcap,
                    # even layers slide (HF order) — models/gemma2.py:204
                    window=cfg.sliding_window if li % 2 == 0 else None,
                )
                o = apply_linear(layer["o"], attn.reshape(b, 1, -1))
                if axis_name is not None:
                    o = jax.lax.psum(o, axis_name)
                o = rms_norm_gemma(o, layer["post_attn_norm"], eps)
                x = x + o
                h2 = rms_norm_gemma(x, layer["mlp_norm"], eps)
                if "gate_up" in layer:
                    gu = apply_linear(layer["gate_up"], h2)
                    inter = gu.shape[-1] // 2
                    gate, up = gu[..., :inter], gu[..., inter:]
                else:
                    gate = apply_linear(layer["gate"], h2)
                    up = apply_linear(layer["up"], h2)
                down = apply_linear(
                    layer["down"], jax.nn.gelu(gate, approximate=True) * up
                )
                if axis_name is not None:
                    down = jax.lax.psum(down, axis_name)
                down = rms_norm_gemma(down, layer["post_mlp_norm"], eps)
                x = x + down
                new_kp.append(kpl)
                new_vp.append(vpl)

            x = rms_norm_gemma(x, params["final_norm"], eps)
            head = params.get("lm_head")
            from flute_tpu.nn import QuantizedLinear

            if isinstance(head, QuantizedLinear):
                logits = head(x)[..., : cfg.vocab_size]
            else:
                logits = jnp.dot(
                    x, params["embed"].T.astype(x.dtype),
                    preferred_element_type=jnp.float32,
                )
            cap = cfg.final_logit_softcap
            logits = jnp.tanh(logits / cap) * cap
            return logits[:, -1], new_kp, new_vp

        def paged_forward_llama(
            params, kp, vp, tables, lengths, tokens, axis_name=None
        ):
            """One paged T=1 forward for every slot (inactive slots compute
            on junk at their frozen position — harmless, masked by the
            host-side slot bookkeeping). Returns last-token logits and the
            updated pools."""
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
                if axis_name is not None:
                    o = jax.lax.psum(o, axis_name)
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
                if axis_name is not None:
                    down = jax.lax.psum(down, axis_name)
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
            return logits[:, -1], new_kp, new_vp

        paged_forward = (
            paged_forward_gemma2 if self._is_gemma2 else paged_forward_llama
        )
        if self.mesh is not None:
            # Megatron TP over the paged step: pools sharded over KV heads,
            # q/k/v/gate/up column-parallel, o/down row-parallel (psums
            # above), tables/lengths/tokens/logits replicated. The paged
            # kernel runs per-rank on its local head shard unchanged —
            # GQA ratio and block layout are head-count-invariant.
            from jax.sharding import PartitionSpec as P

            from flute_tpu.parallel.tp import get_shard_map

            base_forward = paged_forward
            pool_spec = [P(None, "tp", None, None)] * cfg.num_layers

            @functools.partial(
                get_shard_map(),
                mesh=self.mesh,
                in_specs=(self.params_specs, pool_spec, pool_spec,
                          P(), P(), P()),
                out_specs=(P(), pool_spec, pool_spec),
            )
            def paged_forward(params, kp, vp, tables, lengths, tokens):
                return base_forward(
                    params, kp, vp, tables, lengths, tokens, axis_name="tp"
                )

        @functools.partial(jax.jit, donate_argnums=(1, 2, 7))
        def decode_step_greedy(params, kp, vp, tables, lengths, tokens,
                               pcounts, ocounts, pres, freq, rep):
            logits, new_kp, new_vp = paged_forward(
                params, kp, vp, tables, lengths, tokens
            )
            row = logits.astype(jnp.float32)
            pen = _apply_penalties(row, pcounts, ocounts, pres, freq, rep)
            nxt = jnp.argmax(pen, axis=-1).astype(jnp.int32)
            lp = jax.nn.log_softmax(row)[jnp.arange(row.shape[0]), nxt]
            ocounts = ocounts.at[jnp.arange(row.shape[0]), nxt].add(1)
            return nxt, lp, new_kp, new_vp, ocounts

        @functools.partial(jax.jit, donate_argnums=(1, 2, 13))
        def decode_step(params, kp, vp, tables, lengths, tokens,
                        key, gen_counts, temp, top_k, top_p, seeds,
                        pcounts, ocounts, pres, freq, rep):
            logits, new_kp, new_vp = paged_forward(
                params, kp, vp, tables, lengths, tokens
            )
            keys = jax.vmap(
                lambda s, c: jax.random.fold_in(jax.random.fold_in(key, s), c)
            )(seeds, gen_counts)
            row = logits.astype(jnp.float32)
            pen = _apply_penalties(row, pcounts, ocounts, pres, freq, rep)
            nxt = _sample_slots(keys, pen, temp, top_k, top_p)
            # logprob of the RAW model distribution (pre-penalty/warp)
            lp = jax.nn.log_softmax(row)[jnp.arange(row.shape[0]), nxt]
            ocounts = ocounts.at[jnp.arange(row.shape[0]), nxt].add(1)
            return nxt, lp, new_kp, new_vp, ocounts

        self._decode_greedy = decode_step_greedy
        self._decode = decode_step
        self._prefills: dict = {}

    def _prefill_fn(self, csize: int, tb: int):
        """Jitted dense prefill of ``tb`` right-padded tokens at scalar
        position offset ``pos0`` into a ``csize``-column scratch cache;
        returns the logits row of the last real token (``last_idx`` within
        the token bucket)."""
        key = (csize, tb)
        if key not in self._prefills:
            cfg = self.config
            fwd = self.forward

            @jax.jit
            def prefill(params, tokens, small_cache, pos0, last_idx):
                logits, small_cache = fwd(
                    params, cfg, tokens, small_cache, pos0
                )
                row = jax.lax.dynamic_slice_in_dim(
                    logits, last_idx, 1, axis=1
                )[:, 0]
                return row.astype(jnp.float32), small_cache

            self._prefills[key] = prefill
        return self._prefills[key]

    def _pool_prefill_fn(self, tb: int):
        """Jitted pool-backed prefill of a ``tb``-token right-padded chunk
        for one slot: K/V written straight into the slot's pool blocks
        (padding positions routed to the trash block via ``real_end``),
        attention through the fused multi-query paged kernel, logits
        returned for the single row ``last_idx`` (LM head over one token,
        not the chunk). Pools donated."""
        key = ("pool_prefill", tb)
        if key not in self._prefills:
            from flute_tpu.serving.paged_fwd import (
                make_paged_multitoken_forward,
            )

            mt_fwd = make_paged_multitoken_forward(self.config, self.block_size)
            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P

                from flute_tpu.parallel.tp import get_shard_map

                pool_spec = [
                    P(None, "tp", None, None)
                ] * self.config.num_layers

                @functools.partial(
                    get_shard_map(),
                    mesh=self.mesh,
                    in_specs=(self.params_specs, pool_spec, pool_spec,
                              P(), P(), P(), P(), P()),
                    out_specs=(P(), pool_spec, pool_spec),
                )
                def fwd(params, kp, vp, tables, base, toks, rend, last_idx):
                    return mt_fwd(
                        params, kp, vp, tables, base, toks,
                        real_end=rend, last_idx=last_idx, axis_name="tp",
                    )
            else:
                def fwd(params, kp, vp, tables, base, toks, rend, last_idx):
                    return mt_fwd(
                        params, kp, vp, tables, base, toks,
                        real_end=rend, last_idx=last_idx,
                    )

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def pprefill(params, kp, vp, table_row, base, toks,
                         real_end, last_idx):
                logits, kp, vp = fwd(
                    params, kp, vp, table_row[None],
                    base[None], toks, real_end[None], last_idx,
                )
                return logits[0, 0].astype(jnp.float32), kp, vp

            self._prefills[key] = pprefill
        return self._prefills[key]

    def _splice_fn(self, csize: int, nsh: int):
        """Jitted splice of ``nsh`` shared pool blocks into the first
        ``nsh * block`` columns of a ``csize``-column scratch cache — ONE
        dispatch for all layers (the eager per-(layer, block) version cost
        2 * L * nsh dispatches per admission)."""
        key = ("splice", csize, nsh)
        if key not in self._prefills:
            bs = self.block_size

            @functools.partial(jax.jit, donate_argnums=(2,))
            def splice(kp, vp, scratch, rows):
                for li in range(self.config.num_layers):
                    for name, pool in (("k", kp), ("v", vp)):
                        blk = pool[li][rows]  # [nsh, Hkv, bs, D]
                        flat = jnp.swapaxes(blk, 0, 1).reshape(
                            1, blk.shape[1], nsh * bs, blk.shape[3]
                        )
                        scratch[name][li] = (
                            scratch[name][li]
                            .at[:, :, : nsh * bs, :]
                            .set(flat.astype(scratch[name][li].dtype))
                        )
                return scratch

            self._prefills[key] = splice
        return self._prefills[key]

    def _scatter_fn(self, csize: int, nsh: int, m: int):
        """Jitted scatter of scratch-cache blocks [nsh, nsh + m) into pool
        rows ``rows`` [m] — one dispatch for all layers, pools donated."""
        key = ("scatter", csize, nsh, m)
        if key not in self._prefills:
            bs = self.block_size

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def scatter(kp, vp, scratch, rows):
                out_k, out_v = [], []
                for li in range(self.config.num_layers):
                    for src, pool, out in (
                        (scratch["k"][li], kp[li], out_k),
                        (scratch["v"][li], vp[li], out_v),
                    ):
                        seg = src[0, :, nsh * bs:(nsh + m) * bs, :]
                        hkv, _, d = seg.shape
                        blk = jnp.swapaxes(
                            seg.reshape(hkv, m, bs, d), 0, 1
                        )  # [m, Hkv, bs, D]
                        out.append(pool.at[rows].set(blk.astype(pool.dtype)))
                return out_k, out_v

            self._prefills[key] = scatter
        return self._prefills[key]

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

    # -- admission / bookkeeping ------------------------------------------

    def submit(
        self,
        prompt: Sequence[int],
        max_new_tokens: int = 32,
        sampling: Optional[SamplingParams] = None,
        **sampling_kw,
    ) -> int:
        """Queue a request. Per-request sampling: pass a SamplingParams or
        temperature=/top_k=/top_p=/seed= keywords (default greedy)."""
        if len(prompt) + max_new_tokens + self._tail > self.max_len:
            raise ValueError(
                f"prompt {len(prompt)} + budget {max_new_tokens} exceeds "
                f"max_len {self.max_len}"
            )
        need = self._blocks_needed(len(prompt) + max_new_tokens + self._tail)
        if need > self.num_blocks - 1:
            raise ValueError(
                f"request needs {need} blocks; pool has {self.num_blocks - 1}"
            )
        if sampling is None:
            sampling = SamplingParams(**sampling_kw)
        elif sampling_kw:
            raise ValueError("pass either sampling= or keyword params, not both")
        if sampling.has_penalties and not self.supports_penalties:
            raise ValueError(
                "repetition/presence/frequency penalties are not supported "
                "by this engine (speculative verify does not track output "
                "counts); use PagedEngine or ContinuousBatchingEngine"
            )
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append((rid, list(prompt), max_new_tokens, sampling))
        return rid

    def _blocks_needed(self, total_len: int) -> int:
        return -(-total_len // self.block_size)

    # -- prefix cache (pool-level block sharing) ---------------------------

    def _evictable(self) -> int:
        return sum(1 for r in self._prefix_map.values() if self._refs[r] == 0)

    def _take_blocks(self, n: int) -> Optional[list[int]]:
        """Pop ``n`` pool blocks, evicting LRU *unreferenced* cached blocks
        as needed; None when the pool cannot supply them (pressure)."""
        if len(self._free) + self._evictable() < n:
            return None
        while len(self._free) < n:
            for key, row in self._prefix_map.items():  # LRU order
                if self._refs[row] == 0:
                    del self._prefix_map[key]
                    self._free.append(row)
                    break
        return [self._free.pop() for _ in range(n)]

    def _trim_cache(self):
        while len(self._prefix_map) > self.prefix_cache_blocks:
            for key, row in self._prefix_map.items():
                if self._refs[row] == 0:
                    del self._prefix_map[key]
                    self._free.append(row)
                    break
            else:
                break  # every cached block is live-referenced; retry later

    def _find_shared(self, prompt: list) -> list[int]:
        """Pool rows of the longest contiguous cached run over a *proper*
        prefix of ``prompt`` (>= 1 token must remain to prefill for
        next-token logits)."""
        bs = self.block_size
        shared = []
        for i in range(1, (len(prompt) - 1) // bs + 1):
            row = self._prefix_map.get(tuple(prompt[: i * bs]))
            if row is None:
                break
            shared.append(row)
        return shared

    def _admit(self):
        bs = self.block_size
        for slot in range(self.num_slots):
            if self._slot_req[slot] is not None or not self._queue:
                continue
            rid, prompt, budget, sampling = self._queue[0]
            plen = len(prompt)
            nb_total = self._blocks_needed(plen + budget + self._tail)
            shared = (
                self._find_shared(prompt) if self.prefix_cache_blocks else []
            )
            # pin shared rows BEFORE taking blocks: _take_blocks evicts
            # zero-ref cached rows, which is exactly what `shared` is
            for row in shared:
                self._refs[row] += 1
            own = self._take_blocks(nb_total - len(shared))
            if own is None:
                for row in shared:
                    self._refs[row] -= 1
                return  # pool pressure: wait for a slot to free
            self._queue.pop(0)
            for i in range(len(shared)):
                self._prefix_map.move_to_end(tuple(prompt[: (i + 1) * bs]))
            if shared:
                self.prefix_hits += 1
                self.prefix_block_hits += len(shared)
            blocks = shared + own
            self._slot_shared[slot] = list(shared)
            self._slot_blocks[slot] = own
            self._slot_prompt[slot] = list(prompt)
            self._tables[slot, :] = 0
            self._tables[slot, : len(blocks)] = blocks
            self._slot_req[slot] = rid
            self._budget[rid] = budget
            self._out[rid] = []
            self._out_lp[rid] = []
            self._temp[slot] = sampling.temperature
            self._top_k[slot] = sampling.top_k
            self._top_p[slot] = sampling.top_p
            self._seeds[slot] = sampling.seed
            self._stop[slot] = frozenset(sampling.stop_token_ids)
            self._pres[slot] = sampling.presence_penalty
            self._freq[slot] = sampling.frequency_penalty
            self._rep[slot] = sampling.repetition_penalty

            p0 = len(shared) * bs
            rem = plen - p0
            if self.pool_prefill:
                # pool-backed prefill: each chunk's K/V goes straight into
                # the slot's pool blocks (shared prefix blocks attended
                # through the table, zero copies; padding positions routed
                # to the trash block), attention via the fused multi-query
                # paged kernel. Admission memory = one chunk.
                chunk = self.prefill_chunk or 256
                suffix = np.asarray(prompt[p0:], np.int32)
                table_row = jnp.asarray(self._tables[slot])
                rend = jnp.int32(plen)
                c0 = 0
                while c0 < rem:
                    m = min(chunk, rem - c0)
                    tb = bs
                    while tb < m:
                        tb *= 2
                    toks = np.full((1, tb), self.pad_id, np.int32)
                    toks[0, :m] = suffix[c0:c0 + m]
                    last_row, self._kp, self._vp = self._pool_prefill_fn(tb)(
                        self.params, self._kp, self._vp, table_row,
                        jnp.int32(p0 + c0), jnp.asarray(toks),
                        rend, jnp.int32(m - 1),
                    )
                    c0 += m
                if sampling.has_penalties:
                    srow, _, pbins = _first_token_row(
                        np.asarray(last_row, np.float32), prompt, sampling,
                        self.config.vocab_size,
                    )
                    srow_dev = jnp.asarray(srow)
                else:
                    pbins, srow_dev = None, last_row
                first, first_lp = self._sample_first(
                    srow_dev, sampling, last_row
                )
                self._pcounts, self._ocounts = self._counts_clear(
                    self._pcounts, self._ocounts, jnp.int32(slot),
                    self._zero_bins if pbins is None else jnp.asarray(pbins),
                    jnp.int32(first),
                )
                self._lengths[slot] = plen
                self._gen_count[slot] = 1  # next decode draw is generation 1
                self._record(slot, first, first_lp)
                continue

            # dense prefill of the non-shared suffix into a bucketed
            # scratch cache (shared pool blocks spliced in first so the
            # suffix attends to them), then scatter whole new blocks into
            # the pool. RoPE'd K is position-absolute, so block reuse at
            # the same positions is exact.
            csize = bs
            while csize < plen:
                csize *= 2
            scratch = self.init_cache(self.config, 1, csize)
            if shared:
                scratch = self._splice_fn(csize, len(shared))(
                    self._kp, self._vp, scratch,
                    jnp.asarray(np.asarray(shared, np.int32)),
                )
            # right-pad: junk tail K/V is causally masked during prefill
            # and lives past `lengths`, so paged attention never sees it
            chunk = self.prefill_chunk
            if chunk is None or rem <= chunk:
                tb = bs
                while tb < rem:
                    tb *= 2
                toks = np.full((1, tb), self.pad_id, np.int32)
                toks[0, :rem] = prompt[p0:]
                last_row, scratch = self._prefill_fn(csize, tb)(
                    self.params, jnp.asarray(toks), scratch,
                    jnp.int32(p0), jnp.int32(rem - 1),
                )
            else:
                # chunked prefill (bounded per-step latency, one compiled
                # fn reused across chunks — continuous.py's contract):
                # full chunks at exact positions, right-padded remainder
                suffix = np.asarray(prompt[p0:], np.int32)
                full = (rem // chunk) * chunk
                rem_r = rem - full
                for c0 in range(0, full, chunk):
                    last_row, scratch = self._prefill_fn(csize, chunk)(
                        self.params, jnp.asarray(suffix[None, c0:c0 + chunk]),
                        scratch, jnp.int32(p0 + c0), jnp.int32(chunk - 1),
                    )
                if rem_r:
                    rb = bs
                    while rb < rem_r:
                        rb *= 2
                    rtoks = np.full((1, rb), self.pad_id, np.int32)
                    rtoks[0, :rem_r] = suffix[full:]
                    last_row, scratch = self._prefill_fn(csize, rb)(
                        self.params, jnp.asarray(rtoks), scratch,
                        jnp.int32(p0 + full), jnp.int32(rem_r - 1),
                    )
            if sampling.has_penalties:
                srow, _, pbins = _first_token_row(
                    np.asarray(last_row[0], np.float32), prompt, sampling,
                    self.config.vocab_size,
                )
                srow_dev = jnp.asarray(srow)
            else:
                pbins, srow_dev = None, last_row[0]
            first, first_lp = self._sample_first(
                srow_dev, sampling, last_row[0]
            )
            self._pcounts, self._ocounts = self._counts_clear(
                self._pcounts, self._ocounts, jnp.int32(slot),
                self._zero_bins if pbins is None else jnp.asarray(pbins),
                jnp.int32(first),
            )
            nsh = len(shared)
            new_rows = blocks[nsh:self._blocks_needed(plen)]
            self._kp, self._vp = self._scatter_fn(csize, nsh, len(new_rows))(
                self._kp, self._vp, scratch,
                jnp.asarray(np.asarray(new_rows, np.int32)),
            )
            self._lengths[slot] = plen
            self._gen_count[slot] = 1  # next decode draw is generation 1
            self._record(slot, first, first_lp)

    def _record(self, slot: int, tok: int, lp: float = None):
        rid = self._slot_req[slot]
        if (
            self.eos_id is not None and tok == self.eos_id
        ) or tok in self._stop[slot]:
            self._finish(slot)
            return
        self._out[rid].append(tok)
        if lp is not None:
            self._out_lp[rid].append(lp)
        self._last[slot] = tok
        if self.token_callback is not None:
            self.token_callback(rid, tok)
        if len(self._out[rid]) >= self._budget[rid]:
            self._finish(slot)

    def _finish(self, slot: int):
        rid = self._slot_req[slot]
        self._finished[rid] = self._out.pop(rid)
        self.finished_logprobs[rid] = self._out_lp.pop(rid, [])
        bs = self.block_size
        for row in self._slot_shared[slot]:
            self._refs[row] -= 1
        # donate prompt-pure owned blocks to the prefix cache (they become
        # zero-ref cached blocks, shareable by reference and first in line
        # for eviction); free the rest (blocks holding generated K/V)
        prompt = self._slot_prompt[slot] or []
        plen = len(prompt)
        nshare = len(self._slot_shared[slot])
        for gi0, row in enumerate(self._slot_blocks[slot]):
            gi = nshare + gi0
            end = (gi + 1) * bs
            key = tuple(prompt[:end]) if end <= plen else None
            if (
                self.prefix_cache_blocks
                and key is not None
                and key not in self._prefix_map
            ):
                self._prefix_map[key] = row  # donated: zero-ref, evictable
            else:
                self._free.append(row)
        if self.prefix_cache_blocks:
            self._trim_cache()
        self._slot_blocks[slot] = []
        self._slot_shared[slot] = []
        self._slot_prompt[slot] = None
        self._slot_req[slot] = None
        self._stop[slot] = frozenset()
        # park the slot on the trash block at length 0 so its junk decode
        # writes stay out of live blocks
        self._tables[slot, :] = 0
        self._lengths[slot] = 0

    @property
    def blocks_in_use(self) -> int:
        """Blocks held by live requests (excludes the reserved trash block
        and idle cached prefix blocks)."""
        cached_idle = sum(
            1 for r in self._prefix_map.values() if self._refs[r] == 0
        )
        return self.num_blocks - 1 - len(self._free) - cached_idle

    def step(self) -> bool:
        self._admit()
        active = [s for s in range(self.num_slots) if self._slot_req[s] is not None]
        if not active:
            return bool(self._queue)
        pen_args = (
            self._pcounts, self._ocounts, jnp.asarray(self._pres),
            jnp.asarray(self._freq), jnp.asarray(self._rep),
        )
        if all(self._temp[s] <= 0 for s in active):
            nxt, lp, self._kp, self._vp, self._ocounts = self._decode_greedy(
                self.params, self._kp, self._vp,
                jnp.asarray(self._tables), jnp.asarray(self._lengths),
                jnp.asarray(self._last[:, None]), *pen_args,
            )
        else:
            nxt, lp, self._kp, self._vp, self._ocounts = self._decode(
                self.params, self._kp, self._vp,
                jnp.asarray(self._tables), jnp.asarray(self._lengths),
                jnp.asarray(self._last[:, None]),
                self._key, jnp.asarray(self._gen_count),
                jnp.asarray(self._temp), jnp.asarray(self._top_k),
                jnp.asarray(self._top_p), jnp.asarray(self._seeds),
                *pen_args,
            )
        nxt = np.asarray(nxt)
        lp = np.asarray(lp)
        for s in active:
            self._lengths[s] += 1
            self._gen_count[s] += 1
            self._record(s, int(nxt[s]), float(lp[s]))
        return True

    def run(self) -> dict[int, list]:
        while self.step():
            pass
        out, self._finished = self._finished, {}
        return out
