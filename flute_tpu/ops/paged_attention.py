"""Paged decode attention: flash-style GQA over a block-pool KV cache.

The reference serves through vLLM, whose memory system is PagedAttention:
K/V live in fixed-size blocks allocated from a shared pool, and a
per-sequence block table maps logical positions to pool blocks — so HBM
holds sum(len_i) of K/V instead of B x max_len. This module is the
TPU-native equivalent for the decode step (T = 1):

  * the block table and per-sequence lengths are **scalar-prefetched**
    (``pltpu.PrefetchScalarGridSpec``) so each grid step's input DMA
    fetches exactly the pool block the table names — the gather never
    materializes a dense [B, S] cache in HBM;
  * grid = (batch, kv_head, logical_block); the innermost dimension
    accumulates flash-style (running max / sum-exp rescale in VMEM
    scratch), writing the output once on the last block;
  * blocks past a sequence's length are masked via the position iota;
    their table entries are clamped to 0 by the host wrapper so the DMA
    stays in bounds (the compute is fully masked).

Interpret-mode runs the same kernel for CPU tests; `paged_gqa_reference`
is the jnp oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def paged_gqa_reference(
    q: jax.Array,  # [B, H, D]
    k_pool: jax.Array,  # [NB, Hkv, BS, D]
    v_pool: jax.Array,  # [NB, Hkv, BS, D]
    tables: jax.Array,  # [B, MB] int32 pool indices
    lengths: jax.Array,  # [B] int32 valid positions
    *,
    scale: float | None = None,
    softcap: float | None = None,
    window: int | None = None,
) -> jax.Array:
    """Dense jnp oracle: gather blocks, run masked GQA (optionally with
    Gemma-2's attn-logit softcap and a sliding window over the last
    ``window`` positions)."""
    b, h, d = q.shape
    nb, hkv, bs, _ = k_pool.shape
    mb = tables.shape[1]
    rep = h // hkv
    scale = scale if scale is not None else d**-0.5
    # [B, MB, Hkv, BS, D] -> [B, Hkv, MB*BS, D]
    kk = k_pool[tables].transpose(0, 2, 1, 3, 4).reshape(b, hkv, mb * bs, d)
    vv = v_pool[tables].transpose(0, 2, 1, 3, 4).reshape(b, hkv, mb * bs, d)
    qm = q.reshape(b, hkv, rep, d)
    scores = jnp.einsum(
        "bhrd,bhsd->bhrs", qm.astype(jnp.float32), kk.astype(jnp.float32)
    ) * scale
    if softcap is not None:
        scores = jnp.tanh(scores / softcap) * softcap
    pos = jnp.arange(mb * bs, dtype=jnp.int32)[None, None, None, :]
    valid = pos < lengths[:, None, None, None]
    if window is not None:
        # decode query sits at position lengths-1; it sees the last
        # `window` positions: pos >= lengths - window
        valid &= pos >= (lengths[:, None, None, None] - window)
    scores = jnp.where(valid, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhrs,bhsd->bhrd", p, vv.astype(jnp.float32))
    return out.reshape(b, h, d).astype(q.dtype)


def _kernel(
    tables_ref,  # [B, MB] scalar-prefetch
    lengths_ref,  # [B] scalar-prefetch
    q_ref,  # [1, 1, rep_pad, D]
    k_ref,  # [1, 1, BS, D]
    v_ref,  # [1, 1, BS, D]
    o_ref,  # [1, 1, rep_pad, D]
    m_scr,  # [rep_pad, 128] f32 running max (col-broadcast)
    l_scr,  # [rep_pad, 128] f32 running sum-exp
    acc_scr,  # [rep_pad, D] f32 running numerator
    *,
    block_size: int,
    scale: float,
    max_blocks: int,
    softcap: float | None,
    window: int | None,
):
    bi = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lengths_ref[bi]
    base = j * block_size

    live = base < length
    if window is not None:
        # blocks entirely before the window contribute nothing
        live &= base + block_size > length - window

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)  # [rep_pad, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [BS, D]
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [rep_pad, BS]
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap
        pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = pos < length
        if window is not None:
            valid &= pos >= length - window
        s = jnp.where(valid, s, -jnp.inf)

        m_prev = m_scr[:, :1]  # [rep_pad, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        # rescale previous accumulation; exp(-inf - m_new) == 0 handles
        # the first live block cleanly
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [rep_pad, BS]
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == max_blocks - 1)
    def _finish():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def paged_verify_reference(
    q: jax.Array,  # [B, T, H, D]
    k_pool: jax.Array,  # [NB, Hkv, BS, D]
    v_pool: jax.Array,  # [NB, Hkv, BS, D]
    tables: jax.Array,  # [B, MB] int32
    lengths: jax.Array,  # [B] int32: positions already cached BEFORE the run
    *,
    scale: float | None = None,
    softcap: float | None = None,
    window: int | None = None,
) -> jax.Array:
    """Dense jnp oracle for the multi-token verify: query t of sequence b
    sits at position ``lengths[b] + t`` and attends ``lengths[b] + t + 1``
    positions (its own pre-written K/V included)."""
    b, t, h, d = q.shape
    out = []
    for j in range(t):
        out.append(
            paged_gqa_reference(
                q[:, j], k_pool, v_pool, tables, lengths + j + 1,
                scale=scale, softcap=softcap, window=window,
            )
        )
    return jnp.stack(out, axis=1)


def _verify_kernel(
    tables_ref,  # [B, MB] scalar-prefetch
    lengths_ref,  # [B] scalar-prefetch
    q_ref,  # [1, 1, T*rep_pad, D]
    k_ref,  # [1, 1, BS, D]
    v_ref,  # [1, 1, BS, D]
    o_ref,  # [1, 1, T*rep_pad, D]
    m_scr,  # [T*rep_pad, 128] f32
    l_scr,  # [T*rep_pad, 128] f32
    acc_scr,  # [T*rep_pad, D] f32
    *,
    block_size: int,
    scale: float,
    max_blocks: int,
    t_len: int,
    rep_pad: int,
    softcap: float | None,
    window: int | None,
):
    """Multi-query flash accumulation: row r belongs to query index
    ``r // rep_pad`` whose attendable length is ``lengths[bi] + t + 1`` —
    every pool block is DMA'd ONCE for all T queries (the T=1 kernel run
    over virtual slots reads each block T times)."""
    bi = pl.program_id(0)
    j = pl.program_id(2)

    # Finite mask sentinel instead of -inf: rows whose valid range misses a
    # live block entirely (possible here because valid ranges differ per
    # row) would otherwise hit exp(-inf - -inf) = nan. With -1e30, such a
    # row accumulates exp(0)=1 junk while it has seen NO valid position,
    # and the first genuinely valid block zeroes that junk via
    # alpha = exp(-1e30 - m_real) = 0. Every un-padded row has >= 1 valid
    # position overall (its query's own pre-written K/V), so real outputs
    # are never junk-only.
    neg = jnp.float32(-1e30)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, neg)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lengths_ref[bi]
    base = j * block_size

    # live iff the block intersects the union of per-query valid ranges:
    # [length + 1 - window, length + t_len)
    live = base < length + t_len
    if window is not None:
        live &= base + block_size > length + 1 - window

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)  # [T*rep_pad, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [BS, D]
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [T*rep_pad, BS]
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap
        pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        tq = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // rep_pad
        att = length + tq + 1  # attendable positions of this row's query
        valid = pos < att
        if window is not None:
            valid &= pos >= att - window
        s = jnp.where(valid, s, neg)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == max_blocks - 1)
    def _finish():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[...] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "window", "interpret")
)
def paged_verify_attention(
    q: jax.Array,  # [B, T, H, D]
    k_pool: jax.Array,  # [NB, Hkv, BS, D]
    v_pool: jax.Array,  # [NB, Hkv, BS, D]
    tables: jax.Array,  # [B, MB] int32
    lengths: jax.Array,  # [B] int32: cached positions BEFORE the run
    *,
    scale: float | None = None,
    softcap: float | None = None,
    window: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused multi-token paged attention for speculative verify (and any
    short multi-token decode): query t of sequence b sits at position
    ``lengths[b] + t`` with its K/V already scattered into the pool, and
    attends ``lengths[b] + t + 1`` positions. One kernel, one DMA per
    (sequence, kv head, block) — T times less K/V traffic than running
    the T=1 kernel over T virtual slots. Returns [B, T, H, D]."""
    if interpret is None:
        from flute_tpu.ops.lut_gemm import _interpret_default

        interpret = _interpret_default()
    b, t, h, d = q.shape
    nb, hkv, bs, dk = k_pool.shape
    mb = tables.shape[1]
    if d != dk:
        raise ValueError(f"head_dim mismatch: q {d} vs pool {dk}")
    if h % hkv:
        raise ValueError(f"{h} query heads not a multiple of {hkv} kv heads")
    rep = h // hkv
    rep_pad = max(8, -(-rep // 8) * 8)
    scale_f = float(scale if scale is not None else d**-0.5)

    tables = jnp.clip(tables.astype(jnp.int32), 0, nb - 1)
    lengths = lengths.astype(jnp.int32)
    # rows grouped by query index: row t*rep_pad + r <- q[:, t, hi*rep + r]
    qp = jnp.zeros((b, hkv, t * rep_pad, d), q.dtype)
    qr = q.reshape(b, t, hkv, rep, d).transpose(0, 2, 1, 3, 4)  # [B,Hkv,T,rep,D]
    for tj in range(t):
        qp = qp.at[:, :, tj * rep_pad : tj * rep_pad + rep].set(qr[:, :, tj])

    grid = (b, hkv, mb)
    kernel = functools.partial(
        _verify_kernel, block_size=bs, scale=scale_f, max_blocks=mb,
        t_len=t, rep_pad=rep_pad,
        softcap=None if softcap is None else float(softcap),
        window=None if window is None else int(window),
    )
    rows = t * rep_pad
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, rows, d),
                    lambda bi, hi, j, tbl, ln: (bi, hi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bs, d),
                    lambda bi, hi, j, tbl, ln: (tbl[bi, j], hi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bs, d),
                    lambda bi, hi, j, tbl, ln: (tbl[bi, j], hi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, rows, d),
                lambda bi, hi, j, tbl, ln: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows, d), q.dtype),
        interpret=interpret,
    )(tables, lengths, qp, k_pool, v_pool)
    out = out.reshape(b, hkv, t, rep_pad, d)[:, :, :, :rep]
    return out.transpose(0, 2, 1, 3, 4).reshape(b, t, h, d)


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "window", "interpret")
)
def paged_decode_attention(
    q: jax.Array,  # [B, H, D]
    k_pool: jax.Array,  # [NB, Hkv, BS, D]
    v_pool: jax.Array,  # [NB, Hkv, BS, D]
    tables: jax.Array,  # [B, MB] int32
    lengths: jax.Array,  # [B] int32
    *,
    scale: float | None = None,
    softcap: float | None = None,
    window: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Flash-style paged GQA decode attention (T = 1).

    Table entries of blocks at or past a sequence's length may be any
    in-range pool index (they are clamped here and fully masked in the
    kernel). ``softcap`` applies Gemma-2's tanh attn-logit cap; ``window``
    restricts attention to the last ``window`` positions (sliding-window
    layers) — fully-out-of-window blocks skip compute entirely. Returns
    [B, H, D] in q's dtype.
    """
    if interpret is None:
        from flute_tpu.ops.lut_gemm import _interpret_default

        interpret = _interpret_default()
    b, h, d = q.shape
    nb, hkv, bs, dk = k_pool.shape
    mb = tables.shape[1]
    if d != dk:
        raise ValueError(f"head_dim mismatch: q {d} vs pool {dk}")
    if h % hkv:
        raise ValueError(f"{h} query heads not a multiple of {hkv} kv heads")
    rep = h // hkv
    rep_pad = max(8, -(-rep // 8) * 8)  # sublane-align the q rows
    scale_f = float(scale if scale is not None else d**-0.5)

    tables = jnp.clip(tables.astype(jnp.int32), 0, nb - 1)
    lengths = lengths.astype(jnp.int32)
    qp = jnp.zeros((b, hkv, rep_pad, d), q.dtype).at[:, :, :rep].set(
        q.reshape(b, hkv, rep, d)
    )

    grid = (b, hkv, mb)
    kernel = functools.partial(
        _kernel, block_size=bs, scale=scale_f, max_blocks=mb,
        softcap=None if softcap is None else float(softcap),
        window=None if window is None else int(window),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, rep_pad, d),
                    lambda bi, hi, j, tbl, ln: (bi, hi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bs, d),
                    lambda bi, hi, j, tbl, ln: (tbl[bi, j], hi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bs, d),
                    lambda bi, hi, j, tbl, ln: (tbl[bi, j], hi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, rep_pad, d),
                lambda bi, hi, j, tbl, ln: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((rep_pad, 128), jnp.float32),
                pltpu.VMEM((rep_pad, 128), jnp.float32),
                pltpu.VMEM((rep_pad, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep_pad, d), q.dtype),
        interpret=interpret,
    )(tables, lengths, qp, k_pool, v_pool)
    return out[:, :, :rep].reshape(b, h, d)
