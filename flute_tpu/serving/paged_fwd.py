"""Shared multi-token transformer forward through the paged block pool.

One code path serves two consumers (the way vLLM's model runner feeds
both its prefill and multi-token verify through PagedAttention):

  * the **speculative verify** (`serving/paged_spec.py`): T = k+1 draft
    proposals scored in one forward, logits needed at every position;
  * **pool-backed chunked prefill** (`serving/paged.py` with
    ``pool_prefill=True``): a prompt chunk of T tokens written straight
    into pool blocks — no dense scratch cache, no splice/scatter
    dispatches — logits needed only at the last real token.

Mechanics (TPU-first, static shapes):

  * token K/V is scattered to its (pool row, offset) home per layer,
    then ONE fused multi-query paged-attention kernel
    (`ops.paged_attention.paged_verify_attention`) attends with per-row
    lengths ``lengths[b] + j + 1`` — causality inside the speculated run
    or prompt chunk falls out of per-row masks and every pool block is
    DMA'd once for all T queries;
  * ``real_end`` (per-slot, optional) routes writes of right-padding
    positions to the trash block (pool row 0): a rounded-up final
    prefill chunk must not clobber table-indexed blocks past the
    prompt, and out-of-range positions would otherwise clamp into the
    slot's LAST allocated block on top of real K/V;
  * ``last_idx`` (optional scalar) slices the hidden states to one row
    before the LM head — prefill needs one logits row, and a T-row
    head matmul over a 128k vocab is the single largest avoidable cost
    in the chunk;
  * ``axis_name`` enables Megatron-TP psums so the same body runs under
    shard_map (pools sharded over KV heads — the kernel is
    head-count-invariant).

Families: Llama and Gemma-2 (sandwich norms, GeGLU, embed scaling,
softcap + alternating per-row sliding windows), selected from the
config. Reference behavior being matched: vLLM's unified
prefill/decode/spec-decode paged model runner (SURVEY §2.2 "vLLM
integration"); realized here as one traced function instead of a
scheduler special case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flute_tpu.models.llama import (
    apply_linear,
    apply_rope,
    rms_norm,
    rope_tables,
    split_fused_qkv,
)
from flute_tpu.ops.paged_attention import paged_verify_attention


def make_paged_multitoken_forward(config, block_size: int):
    """Build ``fwd(params, kp, vp, tables, lengths, toks, real_end=None,
    last_idx=None, axis_name=None) -> (logits, kp, vp)`` for the config's
    family. ``toks`` is [B, T]; token (b, j) sits at position
    ``lengths[b] + j``. Returns logits [B, T, V] (or [B, 1, V] when
    ``last_idx`` is given) and the updated pools."""
    bs = block_size
    if hasattr(config, "attn_logit_softcap"):
        return _make_gemma2(config, bs)
    return _make_llama(config, bs)


def _scatter_rows(tables, positions, real_end, bs, mb):
    """Pool (row, offset) for each (slot, token); padding positions
    (``>= real_end``) are routed to the trash block (row 0)."""
    b = tables.shape[0]
    prow = jnp.clip(positions // bs, 0, mb - 1)
    rows = tables[jnp.arange(b)[:, None], prow]
    if real_end is not None:
        rows = jnp.where(positions < real_end[:, None], rows, 0)
    return rows, positions % bs


def _head_logits(params, cfg, x, last_idx):
    from flute_tpu.nn import QuantizedLinear

    if last_idx is not None:
        x = jax.lax.dynamic_slice_in_dim(x, last_idx, 1, axis=1)
    head = (
        params["lm_head"]
        if params.get("lm_head") is not None
        else params["embed"].T
    )
    if isinstance(head, QuantizedLinear):
        return head(x)[..., : cfg.vocab_size]
    return jnp.dot(
        x, head.astype(x.dtype), preferred_element_type=jnp.float32
    )


def _make_llama(cfg, bs):
    def fwd(params, kp, vp, tables, lengths, toks,
            real_end=None, last_idx=None, axis_name=None):
        b, t = toks.shape
        mb = tables.shape[1]
        x = params["embed"][toks].astype(cfg.dtype)
        positions = (
            lengths[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        )  # [B, T]
        cos, sin = rope_tables(cfg, positions)
        d = cfg.head_dim
        rows, offs = _scatter_rows(tables, positions, real_end, bs, mb)

        new_kp, new_vp = [], []
        for li, layer in enumerate(params["layers"]):
            h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
            if "qkv" in layer:
                qkv = apply_linear(layer["qkv"], h)
                q, kk, vv = split_fused_qkv(
                    qkv, cfg.num_heads, cfg.num_kv_heads, d
                )
            else:
                q = apply_linear(layer["q"], h).reshape(b, t, -1, d)
                kk = apply_linear(layer["k"], h).reshape(b, t, -1, d)
                vv = apply_linear(layer["v"], h).reshape(b, t, -1, d)
            q = apply_rope(q, cos, sin)
            kk = apply_rope(kk, cos, sin)
            # scatter T entries per slot; (row, off) pairs are distinct
            # within a slot, and cross-slot collisions only happen on the
            # trash block, whose junk is never meaningfully read
            kpl = kp[li].at[rows, :, offs, :].set(kk.astype(kp[li].dtype))
            vpl = vp[li].at[rows, :, offs, :].set(vv.astype(vp[li].dtype))
            attn = paged_verify_attention(q, kpl, vpl, tables, lengths)
            o = apply_linear(layer["o"], attn.reshape(b, t, -1))
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
            down = apply_linear(layer["down"], jax.nn.silu(gate) * up)
            if axis_name is not None:
                down = jax.lax.psum(down, axis_name)
            x = x + down
            new_kp.append(kpl)
            new_vp.append(vpl)

        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return _head_logits(params, cfg, x, last_idx), new_kp, new_vp

    return fwd


def _make_gemma2(cfg, bs):
    def fwd(params, kp, vp, tables, lengths, toks,
            real_end=None, last_idx=None, axis_name=None):
        from flute_tpu.models.gemma2 import rms_norm_gemma
        from flute_tpu.models.gemma2 import rope_tables as g2_rope

        b, t = toks.shape
        mb = tables.shape[1]
        x = params["embed"][toks].astype(cfg.dtype)
        x = x * jnp.asarray(cfg.hidden_size**0.5, cfg.dtype)
        positions = (
            lengths[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        )
        cos, sin = g2_rope(cfg, positions)
        d = cfg.head_dim
        rows, offs = _scatter_rows(tables, positions, real_end, bs, mb)
        eps = cfg.rms_norm_eps

        new_kp, new_vp = [], []
        for li, layer in enumerate(params["layers"]):
            h = rms_norm_gemma(x, layer["attn_norm"], eps)
            if "qkv" in layer:
                qkv = apply_linear(layer["qkv"], h)
                q, kk, vv = split_fused_qkv(
                    qkv, cfg.num_heads, cfg.num_kv_heads, d
                )
            else:
                q = apply_linear(layer["q"], h).reshape(b, t, -1, d)
                kk = apply_linear(layer["k"], h).reshape(b, t, -1, d)
                vv = apply_linear(layer["v"], h).reshape(b, t, -1, d)
            q = apply_rope(q, cos, sin)
            kk = apply_rope(kk, cos, sin)
            kpl = kp[li].at[rows, :, offs, :].set(kk.astype(kp[li].dtype))
            vpl = vp[li].at[rows, :, offs, :].set(vv.astype(vp[li].dtype))
            attn = paged_verify_attention(
                q, kpl, vpl, tables, lengths,
                scale=cfg.query_pre_attn_scalar**-0.5,
                softcap=cfg.attn_logit_softcap,
                # even layers slide (HF order) — models/gemma2.py:204
                window=cfg.sliding_window if li % 2 == 0 else None,
            )
            o = apply_linear(layer["o"], attn.reshape(b, t, -1))
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
        logits = _head_logits(params, cfg, x, last_idx)
        cap = cfg.final_logit_softcap
        return jnp.tanh(logits / cap) * cap, new_kp, new_vp

    return fwd
