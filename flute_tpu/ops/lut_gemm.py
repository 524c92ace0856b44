"""Fused LUT-dequantize + GEMM — the hot path of flute-tpu.

TPU-native re-design of the reference's CUDA kernel stack
(reference: flute/csrc/qgemm_kernel.hpp:26-939 device kernel,
flute/csrc/packbits_utils.hpp:379-427 in-register dequant,
flute/csrc/qgemm.cpp:86-198 torch-op dispatch). None of that architecture
carries over; what carries over is the *contract*:

    y[M, N] = x[M, K] @ (table[codes[K, N]] * scales[K//g, N] expanded)

computed without ever materializing the dequantized weight in HBM.

Kernel structure: one Pallas kernel, grid = (M/bm, N/bn, K/bk) with K
innermost; packed int32 pair-field words stream HBM->VMEM through the
Pallas pipeline (the role of the reference's cp.async stages — Mosaic
double-buffers); f32 accumulation in a VMEM scratch. The reference's
Stream-K cross-CTA atomic fixup (tile_scheduler_utils.hpp:68-209) dissolves
into the sequential K grid dimension — deterministic by construction.

LUT strategies (measured on TPU v5e; see KernelConfig.lut_mode):

* ``gather8`` (default, 16-bit compute dtypes): weights are processed as
  K-adjacent *pairs*. Even/odd sub-codes each index an 8-entry sublane
  ``tpu.dynamic_gather`` (~0.65 cyc/vreg vs 3.9 for the 128-lane gather)
  over tables of raw bf16/f16 *bit patterns*; >8-entry tables use a
  select-chain over 8-entry groups. The two 16-bit results OR-merge into a
  32-bit payload and ``pltpu.bitcast`` lands them on adjacent sublanes for
  free — the TPU-native analogue of the reference's vectorized ``qmap2``
  pair lookup (packbits_utils.hpp:27-144). Measured ~41% of the W4 HBM
  roofline at decode shapes (vs ~14% for naive per-element gathers).

* ``pair_lut``: a *joint* 2^(2b)-entry pair-payload table via 128-lane
  gathers (select-chain over 128-entry groups). This is vector
  dequantization: HIGGS vector_size=2 grids plug in directly as the pair
  table (the reference's qmap2-as-grid insight, flute/integrations/
  higgs.py:8-97).

* ``select``: portable select-sum fallback (no dynamic_gather), used for
  f32 compute and as a correctness cross-check.

The reference's duplicated-qmap smem trick (anti-bank-conflict) is
unnecessary on TPU (VMEM has no bank conflicts) and is dropped.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flute_tpu import bitutils
from flute_tpu.ops.kernel_config import (
    KernelConfig,
    fit_config,
    get_kernel_config,
)

LANE_WIDTH = 128
SUBLANE_TILE = 8  # rows of a 32-bit sublane gather


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


# TPU generations whose tpu.dynamic_gather is verified (on hardware) to wrap
# indices mod 8; on these the `& 7` index mask can be dropped. v5e verified
# bit-exact on-chip 2026-08; other generations keep the mask until probed.
_WRAP_VERIFIED_KINDS = ("v5 lite", "v5e")


@functools.lru_cache(maxsize=1)
def _group_acc_max_bm() -> int:
    from flute_tpu.ops.kernel_config import device_profile

    return device_profile().group_acc_max_bm


@functools.lru_cache(maxsize=1)
def _hw_wrap_ok() -> bool:
    """True when the attached device's gather is known to hw-wrap indices."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return False
    return any(v in kind for v in _WRAP_VERIFIED_KINDS)


@functools.lru_cache(maxsize=1)
def _mosaic_f16_ok() -> bool:
    """True when Mosaic on the attached device compiles f16 vectors
    (v5e does not — BENCH_r04); override with FLUTE_TPU_F16_NATIVE=1."""
    if os.environ.get("FLUTE_TPU_F16_NATIVE") == "1":
        return True
    from flute_tpu.ops.kernel_config import device_profile

    return device_profile().mosaic_f16


# ---------------------------------------------------------------------------
# Reference (oracle) implementation — pure jnp, defines the exact semantics.
# ---------------------------------------------------------------------------


def dequantize_codes(
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    table: jnp.ndarray,
    dtype,
) -> jnp.ndarray:
    """Oracle dequantization: ``table[codes] * scales`` with group expansion.

    Matches the kernel's rounding exactly: lookup and scale multiply happen
    in ``dtype`` (the role of the reference's ``nf_quantize_2``,
    flute/nf_utils.py:75-89).
    """
    k = codes.shape[0]
    group_size = k // scales.shape[0]
    t = table.astype(dtype)
    s = jnp.repeat(scales.astype(dtype), group_size, axis=0)
    return t[codes] * s


def dequantize_codes_pair(
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    pair_values: jnp.ndarray,
    dtype,
) -> jnp.ndarray:
    """Oracle for joint pair (vector) dequantization: rows (2j, 2j+1) take
    their values from ``pair_values[c_2j, c_2j+1]`` (shape [E, E, 2])."""
    k = codes.shape[0]
    group_size = k // scales.shape[0]
    pv = pair_values.astype(dtype)
    ce, co = codes[0::2], codes[1::2]
    v = pv[ce, co]  # [K/2, N, 2]
    deq = jnp.stack([v[..., 0], v[..., 1]], axis=1).reshape(codes.shape)
    s = jnp.repeat(scales.astype(dtype), group_size, axis=0)
    return deq * s


def lut_qgemm_reference(
    x: jnp.ndarray,
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    table: jnp.ndarray,
) -> jnp.ndarray:
    """Pure-XLA ground truth (role of reference tests/kernel.py:68-71)."""
    ct = x.dtype
    deq = dequantize_codes(codes, scales, table, ct)
    # the TPU MXU computes f32 dots through bf16 passes at default
    # precision — an oracle must not round what the kernel keeps exact
    prec = lax.Precision.HIGHEST if jnp.dtype(ct).itemsize == 4 else None
    y = jnp.dot(x, deq, preferred_element_type=jnp.float32, precision=prec)
    return y.astype(ct)


# ---------------------------------------------------------------------------
# In-kernel building blocks
# ---------------------------------------------------------------------------

_DN_SUBLANE = lax.GatherDimensionNumbers(
    offset_dims=(),
    collapsed_slice_dims=(0,),
    start_index_map=(0,),
    operand_batching_dims=(1,),
    start_indices_batching_dims=(1,),
)
_DN_LANE = lax.GatherDimensionNumbers(
    offset_dims=(),
    collapsed_slice_dims=(1,),
    start_index_map=(1,),
    operand_batching_dims=(0,),
    start_indices_batching_dims=(0,),
)


def _gather_sublane(op: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[i, j] = op[idx[i, j], j]; op/idx/out all [8, n], idx < 8."""
    return lax.gather(
        op, idx[..., None], _DN_SUBLANE, slice_sizes=(1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _gather_lane(op: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[i, j] = op[i, idx[i, j]]; op/idx/out all [r, 128], idx < 128."""
    return lax.gather(
        op, idx[..., None], _DN_LANE, slice_sizes=(1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _unpack_pair_fields(
    plane_vals: Sequence[jnp.ndarray],
    plane_bits: Sequence[int],
    block_k: int,
    chunk: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unpack int32 pair-field words into (ce, co) int32 [block_k//2, bn].

    Static shifts/masks + in-order sublane concatenation; see
    flute_tpu/packing.py for the layout contract.
    """
    pairs_per_chunk = chunk // 2
    ce_acc = None
    co_acc = None
    shift = 0
    for words, pb in zip(plane_vals, plane_bits):
        fb = 2 * pb
        r = bitutils.WORD_BITS // fb
        kc = pairs_per_chunk // r
        mask = (1 << fb) - 1
        slabs = []
        for c in range(block_k // chunk):
            w = words[c * kc:(c + 1) * kc]
            for i in range(r):
                slabs.append((w >> (fb * i)) & mask)
        pf = jnp.concatenate(slabs, axis=0)  # [block_k//2, bn] pair fields
        ce_p = pf & ((1 << pb) - 1)
        co_p = pf >> pb
        if shift == 0:
            ce_acc, co_acc = ce_p, co_p
        else:
            ce_acc = ce_acc | (ce_p << shift)
            co_acc = co_acc | (co_p << shift)
        shift += pb
    return ce_acc, co_acc


def _lookup_bits_sublane(
    tile: jnp.ndarray,
    codes: jnp.ndarray,
    num_entries: int,
    col0: int,
    bn: int,
    wrap: bool = False,
) -> jnp.ndarray:
    """Gather raw 16/32-bit table *bit patterns* (held as int32) for
    ``codes`` [rows, bn] via 8-entry sublane gathers.

    ``tile`` is the [8, 128] int32 table tile; columns ``col0 + g`` hold
    entry group g (entries 8g..8g+7). >8-entry tables use a where-chain
    over groups.

    ``wrap``: v5e's tpu.dynamic_gather reads indices mod 8 in hardware
    (verified empirically on-chip: unmasked == masked), so the ``& 7``
    index mask can be skipped in compiled mode. The interpreter does not
    emulate the wrap, so callers must pass wrap=False there.
    """
    ngroups = -(-num_entries // SUBLANE_TILE)
    ops = [
        jnp.broadcast_to(tile[:, col0 + g:col0 + g + 1], (SUBLANE_TILE, bn))
        for g in range(ngroups)
    ]
    rows = codes.shape[0]
    out_slices = []
    for r in range(rows // SUBLANE_TILE):
        c8 = codes[r * SUBLANE_TILE:(r + 1) * SUBLANE_TILE]
        if ngroups == 1:
            res = _gather_sublane(ops[0], c8)
        else:
            idx = c8 if wrap else (c8 & (SUBLANE_TILE - 1))
            res = _gather_sublane(ops[0], idx)
            for g in range(1, ngroups):
                res = jnp.where(
                    c8 >= g * SUBLANE_TILE, _gather_sublane(ops[g], idx), res
                )
        out_slices.append(res)
    return jnp.concatenate(out_slices, axis=0)


def _lookup_payload_lane(
    tile: jnp.ndarray,
    pc: jnp.ndarray,
    num_entries: int,
) -> jnp.ndarray:
    """Gather 32-bit payloads for pair codes ``pc`` [rows, bn] from a joint
    table of ``num_entries`` (≤ 16384) via 128-lane gathers with a
    where-chain over 128-entry groups. ``tile`` is [G, 128] int32."""
    ngroups = -(-num_entries // LANE_WIDTH)
    rows, bn = pc.shape
    ops = [
        jnp.broadcast_to(tile[g:g + 1, :], (rows, LANE_WIDTH))
        for g in range(ngroups)
    ]
    parts = []
    for j in range(bn // LANE_WIDTH):
        pcs = pc[:, j * LANE_WIDTH:(j + 1) * LANE_WIDTH]
        if ngroups == 1:
            res = _gather_lane(ops[0], pcs)
        else:
            idx = pcs & (LANE_WIDTH - 1)
            res = _gather_lane(ops[0], idx)
            for g in range(1, ngroups):
                res = jnp.where(
                    pcs >= g * LANE_WIDTH, _gather_lane(ops[g], idx), res
                )
        parts.append(res)
    return jnp.concatenate(parts, axis=1)


def _select_values(
    tile: jnp.ndarray,
    codes: jnp.ndarray,
    num_entries: int,
    col0: int,
) -> jnp.ndarray:
    """Portable select-sum over raw bit patterns (int32)."""
    acc = jnp.full(codes.shape, tile[0, col0], dtype=jnp.int32)
    for i in range(1, num_entries):
        acc = jnp.where(
            codes == i, tile[i % SUBLANE_TILE, col0 + i // SUBLANE_TILE], acc
        )
    return acc


def _expand_scales(s: jnp.ndarray, rows_per_group: int, rows: int) -> jnp.ndarray:
    """Expand ``[rows//rpg, bn]`` scales to ``[rows, bn]`` by row broadcast +
    concat (static, shuffle-free)."""
    ngroups = rows // rows_per_group
    if ngroups == 1:
        return jnp.broadcast_to(s[0:1], (rows, s.shape[1]))
    pieces = [
        jnp.broadcast_to(s[i:i + 1], (rows_per_group, s.shape[1]))
        for i in range(ngroups)
    ]
    return jnp.concatenate(pieces, axis=0)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _unpack_wide3_payload(
    words: jnp.ndarray,
    tile: jnp.ndarray,
    block_k: int,
    chunk: int,
    bn: int,
    wrap: bool,
    merge16: bool = True,
):
    """Wide 3-bit path: extract 6-bit pair fields from the planar 3-word
    groups (see packing.pack_w3_wide_np) and look both sides up with single
    chainless 8-entry gathers — the raw field is the even index (hardware
    mod-8 wrap eats the high bits), one shift gives the odd index.

    With ``merge16`` (bf16/f16 compute) returns the merged 32-bit payloads
    [block_k//2, bn]; otherwise (f32 compute) returns the (even, odd)
    f32-bit-pattern tensors for explicit row interleaving."""
    op_e = jnp.broadcast_to(tile[:, 0:1], (SUBLANE_TILE, bn))
    op_o = jnp.broadcast_to(tile[:, 1:2], (SUBLANE_TILE, bn))
    cp = chunk // 2
    ntrip = cp // 16
    kc = 3 * ntrip
    out = []
    out_o = [] if not merge16 else None
    for c in range(block_k // chunk):
        w = words[c * kc:(c + 1) * kc]
        ws = (w[0:ntrip], w[ntrip:2 * ntrip], w[2 * ntrip:])
        for j in range(16):
            bit = 6 * j
            a, off = bit // 32, bit % 32
            if off + 6 <= 32:
                pf = (ws[a] >> off) & 0x3F
            else:
                # straddling field: mask the low part BEFORE or-ing — int32
                # >> is arithmetic, and sign extension would otherwise
                # pollute the bits contributed by the next word
                lo = (ws[a] >> off) & ((1 << (32 - off)) - 1)
                pf = (lo | (ws[a + 1] << (32 - off))) & 0x3F
            for s in range(ntrip // SUBLANE_TILE):
                sl = pf[s * SUBLANE_TILE:(s + 1) * SUBLANE_TILE]
                idx_e = sl if wrap else (sl & (SUBLANE_TILE - 1))
                ge = _gather_sublane(op_e, idx_e)
                go = _gather_sublane(op_o, sl >> 3)
                if merge16:
                    out.append(ge | go)
                else:
                    out.append(ge)
                    out_o.append(go)
    if merge16:
        return jnp.concatenate(out, axis=0)
    return jnp.concatenate(out, axis=0), jnp.concatenate(out_o, axis=0)


def _unpack_w4sym_payload(
    words: jnp.ndarray,
    tile: jnp.ndarray,
    block_k: int,
    chunk: int,
    bn: int,
    wrap: bool,
    merge16: bool = True,
):
    """Sign-symmetric 4-bit path (see packing.pack_w4_sym_np): byte-aligned
    8-bit pair fields ``[s_o s_e m_o(3) m_e(3)]``, four per int32 word in the
    standard chunked pair-plane order. Per field: three chainless 8-entry
    sublane gathers whose index windows are plain shifts of the word — the
    hardware mod-8 wrap eats every high bit — over (even magnitudes, odd
    magnitudes << 16, sign masks). The sign table is 4 entries duplicated
    over index bit 2 so the window's pollution bit is harmless. Payload =
    ``(ge | go) ^ gs``: XOR flips the bf16/f16 sign bits, honouring the
    table contract ``table[c + 8] == -table[c]`` for values of either sign.

    With ``merge16`` (bf16/f16) returns merged 32-bit payloads
    ``[block_k//2, bn]``; otherwise (f32 compute) returns the (even, odd)
    f32-bit-pattern tensors, with per-side sign columns, for explicit row
    interleaving."""
    op_e = jnp.broadcast_to(tile[:, 0:1], (SUBLANE_TILE, bn))
    op_o = jnp.broadcast_to(tile[:, 1:2], (SUBLANE_TILE, bn))
    if merge16:
        op_s = jnp.broadcast_to(tile[:, 2:3], (SUBLANE_TILE, bn))
    else:
        op_se = jnp.broadcast_to(tile[:, 2:3], (SUBLANE_TILE, bn))
        op_so = jnp.broadcast_to(tile[:, 3:4], (SUBLANE_TILE, bn))
    cp = chunk // 2
    r = 4  # byte fields per word
    kc = cp // r
    out = []
    out_o = [] if not merge16 else None
    for c in range(block_k // chunk):
        w = words[c * kc:(c + 1) * kc]
        for j in range(r):
            f = w if j == 0 else (w >> (8 * j))
            for s in range(kc // SUBLANE_TILE):
                sl = f[s * SUBLANE_TILE:(s + 1) * SUBLANE_TILE]
                idx_e = sl if wrap else (sl & 7)
                sl3 = sl >> 3
                idx_o = sl3 if wrap else (sl3 & 7)
                sl6 = sl >> 6
                idx_s = sl6 if wrap else (sl6 & 7)
                ge = _gather_sublane(op_e, idx_e)
                go = _gather_sublane(op_o, idx_o)
                if merge16:
                    gs = _gather_sublane(op_s, idx_s)
                    out.append((ge | go) ^ gs)
                else:
                    out.append(ge ^ _gather_sublane(op_se, idx_s))
                    out_o.append(go ^ _gather_sublane(op_so, idx_s))
    if merge16:
        return jnp.concatenate(out, axis=0)
    return jnp.concatenate(out, axis=0), jnp.concatenate(out_o, axis=0)


def _lut_qgemm_kernel(
    *refs,
    num_planes: int,
    plane_bits: tuple[int, ...],
    group_size: int,
    config: KernelConfig,
    num_entries: int,
    out_dtype,
    bn: int,
    joint_entries: int,
    wrap: bool,
    group_acc: bool,
    layout: str = "plane",
):
    k_index = pl.program_id(2)
    nk = pl.num_programs(2)
    bk = config.block_k
    is16 = jnp.dtype(out_dtype).itemsize == 2
    # 32-bit compute streams x pre-split into even/odd K columns so the
    # (even, odd) dequant halves are used directly — row-interleaving a
    # [bk, bn] f32 block in-kernel costs sublane shuffles over the whole
    # weight tile (measured ~10x on the f16->f32 fallback, round 5).
    split_x = not is16
    if split_x:
        xe_ref, xo_ref = refs[0], refs[1]
        rest = refs[2:]
    else:
        x_ref = refs[0]
        rest = refs[1:]
    plane_refs = rest[:num_planes]
    s_ref = rest[num_planes]
    t_ref = rest[1 + num_planes]
    o_ref = rest[2 + num_planes]
    acc_ref = rest[3 + num_planes]

    @pl.when(k_index == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ve = vo = None  # (even, odd) dequant halves, 32-bit compute only
    if layout == "w3wide":
        if is16:
            payload32 = _unpack_wide3_payload(
                plane_refs[0][:], t_ref[:], bk, config.chunk, bn, wrap
            )
            deq = pltpu.bitcast(payload32, out_dtype)
        else:
            ve_b, vo_b = _unpack_wide3_payload(
                plane_refs[0][:], t_ref[:], bk, config.chunk, bn, wrap,
                merge16=False,
            )
            ve = pltpu.bitcast(ve_b, out_dtype)
            vo = pltpu.bitcast(vo_b, out_dtype)
        ce = co = None
    elif layout == "w4sym":
        if is16:
            payload32 = _unpack_w4sym_payload(
                plane_refs[0][:], t_ref[:], bk, config.chunk, bn, wrap
            )
            deq = pltpu.bitcast(payload32, out_dtype)
        else:
            ve_b, vo_b = _unpack_w4sym_payload(
                plane_refs[0][:], t_ref[:], bk, config.chunk, bn, wrap,
                merge16=False,
            )
            ve = pltpu.bitcast(ve_b, out_dtype)
            vo = pltpu.bitcast(vo_b, out_dtype)
        ce = co = None
    else:
        ce, co = _unpack_pair_fields(
            [p[:] for p in plane_refs], plane_bits, bk, config.chunk
        )
    tile = t_ref[:]
    num_bits = sum(plane_bits)
    ngroups = -(-num_entries // SUBLANE_TILE)

    mode = config.lut_mode
    if layout in ("w3wide", "w4sym"):
        pass
    elif mode == "pair_lut":
        if not is16:
            raise NotImplementedError("pair_lut requires a 16-bit compute dtype")
        pc = ce | (co << num_bits)
        payload32 = _lookup_payload_lane(tile, pc, joint_entries)
        deq = pltpu.bitcast(payload32, out_dtype)  # [bk, bn]
    else:
        if mode == "gather8":
            ve_bits = _lookup_bits_sublane(tile, ce, num_entries, 0, bn, wrap)
            vo_bits = _lookup_bits_sublane(
                tile, co, num_entries, ngroups, bn, wrap
            )
        elif mode == "select":
            ve_bits = _select_values(tile, ce, num_entries, 0)
            vo_bits = _select_values(tile, co, num_entries, ngroups)
        else:
            raise ValueError(f"Unknown lut_mode: {mode}")
        if is16:
            # OR-merge 16-bit patterns (odd side pre-shifted << 16 in the
            # table tile) into 32-bit payloads; the bitcast interleaves rows
            # (2j, 2j+1) for free.
            payload32 = ve_bits | vo_bits
            deq = pltpu.bitcast(payload32, out_dtype)  # [bk, bn]
        else:
            # 32-bit compute: bit patterns are full f32 words; keep the
            # (even, odd) halves and split the dot instead of interleaving
            # (compat path — the flagship dtypes are bf16/f16, matching the
            # reference's supported dtypes, README.md:233).
            ve = pltpu.bitcast(ve_bits, out_dtype)
            vo = pltpu.bitcast(vo_bits, out_dtype)

    acc_dt = acc_ref.dtype
    g = group_size
    # The MXU multiplies f32 operands through bf16 passes; at default
    # precision a 32-bit-compute dot silently rounds every weight to bf16
    # (caught on-chip by the identity oracle, round 5). HIGHEST recovers
    # full f32 products (Mosaic supports only DEFAULT/HIGHEST in-kernel);
    # 16-bit compute is MXU-native.
    prec = None if is16 else lax.Precision.HIGHEST
    if group_acc and split_x:
        # y = x_even @ v_even + x_odd @ v_odd — no interleave anywhere.
        # Identity stays bit-exact: with x = I each output element has
        # exactly one nonzero contribution, so the split changes no sums.
        h = g // 2
        for gi in range(bk // g):
            part = jnp.dot(
                xe_ref[:, gi * h:(gi + 1) * h],
                ve[gi * h:(gi + 1) * h],
                preferred_element_type=jnp.float32,
                precision=prec,
            ) + jnp.dot(
                xo_ref[:, gi * h:(gi + 1) * h],
                vo[gi * h:(gi + 1) * h],
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            acc_ref[:] += (part * s_ref[gi, :][None, :].astype(jnp.float32)).astype(acc_dt)
    elif group_acc:
        # Decode path: apply group scales to the [bm, bn] partial products
        # instead of the [bk, bn] dequantized weights — group_size/bm times
        # fewer scale multiplies (measured ~25% faster at M=16 on v5e).
        # Identity-input bit-exactness is preserved: the f32 partial times
        # the bf16 scale rounds identically to the bf16 (value * scale).
        for gi in range(bk // g):
            part = jnp.dot(
                x_ref[:, gi * g:(gi + 1) * g],
                deq[gi * g:(gi + 1) * g],
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] += (part * s_ref[gi, :][None, :].astype(jnp.float32)).astype(acc_dt)
    elif split_x:
        s_half = _expand_scales(s_ref[:], g // 2, bk // 2)
        acc_ref[:] += (
            jnp.dot(xe_ref[:], ve * s_half,
                    preferred_element_type=jnp.float32, precision=prec)
            + jnp.dot(xo_ref[:], vo * s_half,
                      preferred_element_type=jnp.float32, precision=prec)
        ).astype(acc_dt)
    else:
        s_exp = _expand_scales(s_ref[:], group_size, bk)
        w = deq * s_exp
        acc_ref[:] += jnp.dot(
            x_ref[:], w, preferred_element_type=jnp.float32
        ).astype(acc_dt)

    @pl.when(k_index == nk - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(out_dtype)


# ---------------------------------------------------------------------------
# Table tile construction (wrapper-side, jittable)
# ---------------------------------------------------------------------------


def _bits16(values: jnp.ndarray, ct) -> jnp.ndarray:
    """Raw 16-bit patterns of values rounded to ct, as int32."""
    b = lax.bitcast_convert_type(values.astype(ct), jnp.uint16)
    return b.astype(jnp.int32)


def _bits32(values: jnp.ndarray) -> jnp.ndarray:
    return lax.bitcast_convert_type(values.astype(jnp.float32), jnp.int32)


def _table_tile_scalar(table: jnp.ndarray, ct, num_entries: int) -> jnp.ndarray:
    """[8, 128] int32 tile for gather8/select: columns [0, G) hold even-side
    entry groups, columns [G, 2G) hold odd-side groups (pre-shifted << 16
    for 16-bit compute dtypes)."""
    ngroups = -(-num_entries // SUBLANE_TILE)
    pad = ngroups * SUBLANE_TILE - num_entries
    is16 = jnp.dtype(ct).itemsize == 2
    bits = _bits16(table, ct) if is16 else _bits32(table)
    bits = jnp.pad(bits, (0, pad))
    cols = bits.reshape(ngroups, SUBLANE_TILE).T  # [8, G]
    odd = (cols << 16) if is16 else cols
    tile = jnp.zeros((SUBLANE_TILE, LANE_WIDTH), jnp.int32)
    tile = tile.at[:, :ngroups].set(cols)
    tile = tile.at[:, ngroups:2 * ngroups].set(odd)
    return tile


def _table_tile_w4sym(table: jnp.ndarray, ct) -> jnp.ndarray:
    """[8, 128] int32 tile for the w4sym path. ``table`` is in
    sign-magnitude code order (table[c+8] == -table[c]); only the magnitude
    half table[0:8] is materialized. Columns: 0 = magnitude bit patterns
    (even side), 1 = magnitudes pre-shifted << 16 (odd side; f32: unshifted),
    2 = sign-XOR masks for the pair-sign window (4 entries duplicated over
    index bit 2); f32 compute splits the masks over columns 2 (even) and 3
    (odd)."""
    mags = table[:SUBLANE_TILE]
    is16 = jnp.dtype(ct).itemsize == 2
    bits = _bits16(mags, ct) if is16 else _bits32(mags)
    idx = jnp.arange(SUBLANE_TILE, dtype=jnp.uint32)
    tile = jnp.zeros((SUBLANE_TILE, LANE_WIDTH), jnp.int32)
    tile = tile.at[:, 0].set(bits)
    if is16:
        tile = tile.at[:, 1].set(bits << 16)
        smask = ((idx & 1) << 15) | ((idx & 2) << 30)
        tile = tile.at[:, 2].set(smask.astype(jnp.int32))
    else:
        tile = tile.at[:, 1].set(bits)
        tile = tile.at[:, 2].set(((idx & 1) << 31).astype(jnp.int32))
        tile = tile.at[:, 3].set(((idx & 2) << 30).astype(jnp.int32))
    return tile


def _table_tile_pair(
    pair_values: jnp.ndarray, ct, num_bits: int
) -> jnp.ndarray:
    """[G, 128] int32 payload tile for pair_lut: entry pc = ce | co << b
    holds bits16(v[ce,co,0]) | bits16(v[ce,co,1]) << 16."""
    e = 2 ** num_bits
    v = pair_values.reshape(e, e, 2)
    lo = _bits16(v[:, :, 0], ct)  # [ce, co]
    hi = _bits16(v[:, :, 1], ct)
    payload = lo | (hi << 16)  # indexed [ce, co]
    flat = payload.T.reshape(-1)  # pc = ce | co<<b -> index co*e + ce = [co, ce] -> T
    joint = e * e
    ngroups = -(-joint // LANE_WIDTH)
    flat = jnp.pad(flat, (0, ngroups * LANE_WIDTH - joint))
    return flat.reshape(ngroups, LANE_WIDTH)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("num_bits", "config", "interpret", "layout"),
)
def _lut_qgemm_2d(
    x: jnp.ndarray,
    planes: tuple[jnp.ndarray, ...],
    scales: jnp.ndarray,
    table: jnp.ndarray,
    pair_values: Optional[jnp.ndarray],
    *,
    num_bits: int,
    config: KernelConfig,
    interpret: bool,
    layout: str = "plane",
) -> jnp.ndarray:
    m, k = x.shape
    n = scales.shape[1]
    group_size = k // scales.shape[0]
    if layout == "w3wide":
        plane_bits = (3,)
    elif layout == "w4sym":
        plane_bits = (4,)
    else:
        plane_bits = bitutils.planes_for_bits(num_bits)
    ct = x.dtype
    num_entries = 2 ** num_bits
    joint_entries = num_entries * num_entries

    bm, bn, bk = config.block_m, config.block_n, config.block_k
    assert m % bm == 0 and n % bn == 0 and k % bk == 0, (m, n, k, config)
    grid = (m // bm, n // bn, k // bk)

    if layout == "w4sym":
        if pair_values is not None:
            raise ValueError("pair_values incompatible with layout='w4sym'")
        tile = _table_tile_w4sym(table, ct)
    elif config.lut_mode == "pair_lut":
        if pair_values is None:
            # Separable pair table from the scalar table (outer structure).
            e = num_entries
            pv = jnp.stack(
                [
                    jnp.broadcast_to(table[:, None], (e, e)),
                    jnp.broadcast_to(table[None, :], (e, e)),
                ],
                axis=-1,
            )
        else:
            pv = pair_values
        tile = _table_tile_pair(pv, ct, num_bits)
    else:
        if pair_values is not None:
            raise ValueError("pair_values requires lut_mode='pair_lut'")
        tile = _table_tile_scalar(table, ct, num_entries)

    split_x = jnp.dtype(ct).itemsize != 2
    if split_x:
        # 32-bit compute: ship x de-interleaved (even/odd K columns) so the
        # kernel never row-interleaves the [bk, bn] dequant block — the XLA
        # strided slice on the small [m, k] activation is ~free.
        x_inputs = (x[:, 0::2], x[:, 1::2])
        in_specs = [
            pl.BlockSpec(
                (bm, bk // 2), lambda i, j, kk: (i, kk),
                memory_space=pltpu.VMEM,
            )
            for _ in range(2)
        ]
    else:
        x_inputs = (x,)
        in_specs = [
            pl.BlockSpec(
                (bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
        ]
    for pb in plane_bits:
        rows = bk * pb // bitutils.WORD_BITS
        in_specs.append(
            pl.BlockSpec(
                (rows, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            )
        )
    in_specs.append(
        pl.BlockSpec(
            (bk // group_size, bn),
            lambda i, j, kk: (kk, j),
            memory_space=pltpu.VMEM,
        )
    )
    in_specs.append(
        pl.BlockSpec(tile.shape, lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM)
    )

    kernel = functools.partial(
        _lut_qgemm_kernel,
        num_planes=len(plane_bits),
        plane_bits=plane_bits,
        group_size=group_size,
        config=config,
        num_entries=num_entries,
        out_dtype=ct,
        bn=bn,
        joint_entries=joint_entries,
        # hw mod-8 index wrap: only on verified TPU generations, and never in
        # the interpreter (which does not emulate the wrap)
        wrap=not interpret and _hw_wrap_ok(),
        # group-scaled accumulation wins when the MXU is latency-tolerant
        # (decode); weight-side scaling wins at prefill M (deep-K matmuls);
        # threshold lives in the device profile (v5e-calibrated)
        group_acc=bm <= _group_acc_max_bm(),
        layout=layout,
    )

    weight_bytes = sum(p.size * 4 for p in planes)
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=(
            x.size * x.dtype.itemsize
            + weight_bytes
            + scales.size * scales.dtype.itemsize
            + m * n * jnp.dtype(ct).itemsize
        ),
        transcendentals=0,
    )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), ct),
        # accum policy: "high" keeps an f32 accumulator (reference High /
        # default Mixed-equivalent); "low" accumulates in the compute dtype
        # (reference AccumulationModeEnum::Low, config.hpp:111) — shipped
        # as a measured ablation, see docs/ACCUM.md.
        scratch_shapes=[
            pltpu.VMEM(
                (bm, bn),
                jnp.float32 if config.accum == "high" else ct,
            )
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*x_inputs, *planes, scales, tile)


def lut_qgemm(
    x: jnp.ndarray,
    qweight: Sequence[jnp.ndarray] | jnp.ndarray,
    scales: jnp.ndarray,
    table: jnp.ndarray,
    *,
    num_bits: int,
    config: KernelConfig | None = None,
    pair_values: Optional[jnp.ndarray] = None,
    interpret: bool | None = None,
    layout: str = "auto",
) -> jnp.ndarray:
    """Fused LUT-dequant GEMM: ``x @ (table[codes] * scales_expanded)``.

    Args:
      x: ``[..., K]`` activations (bf16/f16/f32).
      qweight: packed int32 plane list from :func:`flute_tpu.packing.pack`
        (single plane for 2/4-bit, two planes for 3-bit).
      scales: ``[K // group_size, N]``.
      table: ``[2^num_bits]`` lookup table (any dtype; rounded to x.dtype).
      num_bits: 2, 3 or 4.
      config: kernel block config; default = static heuristic per shape.
      pair_values: optional joint pair table ``[2^b, 2^b, 2]`` for vector
        dequantization (HIGGS); forces lut_mode='pair_lut'.
      interpret: force Pallas interpreter mode (defaults to True on CPU).
      layout: packed-weight layout. "auto" detects the wide 3-bit layout by
        plane shape and otherwise assumes the standard plane layout;
        "w4sym" selects the sign-symmetric 4-bit fast path
        (:func:`flute_tpu.packing.pack_w4_sym_np`; requires
        ``table[c + 8] == -table[c]`` — it cannot be shape-detected, so
        callers carrying w4sym weights must pass it explicitly).
    """
    if isinstance(qweight, (jnp.ndarray, jax.Array)):
        qweight = [qweight]
    planes = tuple(qweight)
    n = scales.shape[1]
    *batch, k = x.shape
    m = 1
    for b in batch:
        m *= b
    if k % scales.shape[0] != 0:
        raise ValueError(f"K={k} not divisible by scale groups {scales.shape[0]}")
    group_size = k // scales.shape[0]
    # shape invariants (role of the reference's fake-op checks, ops.py:4-55);
    # 3-bit accepts either the classic 2+1 plane split or the wide
    # single-plane layout (packing.pack_w3_wide_np), detected by shape
    from flute_tpu import packing as _packing

    if layout == "auto":
        layout = "w3wide" if _packing.is_w3_wide(planes, num_bits, k) else "plane"
    if layout not in ("plane", "w3wide", "w4sym"):
        raise ValueError(f"Unknown layout: {layout}")
    if layout == "w3wide":
        if num_bits != 3 or not _packing.is_w3_wide(planes, num_bits, k):
            raise ValueError("layout='w3wide' requires a wide 3-bit plane")
    elif layout == "w4sym":
        if num_bits != 4:
            raise ValueError("layout='w4sym' requires num_bits=4")
        want = (k // 8, n)
        if len(planes) != 1 or tuple(planes[0].shape) != want:
            raise ValueError(
                f"w4sym plane shape {[tuple(p.shape) for p in planes]} != "
                f"expected [{want}] for K={k}, N={n}"
            )
    else:
        plane_bits_chk = bitutils.planes_for_bits(num_bits)
        if len(planes) != len(plane_bits_chk):
            raise ValueError(
                f"{num_bits}-bit weights need {len(plane_bits_chk)} plane(s), "
                f"got {len(planes)}"
            )
        for p, pb in zip(planes, plane_bits_chk):
            want = (k * pb // bitutils.WORD_BITS, n)
            if tuple(p.shape) != want:
                raise ValueError(
                    f"packed plane shape {tuple(p.shape)} != expected {want} "
                    f"for K={k}, N={n}, plane bits={pb}"
                )
    if table is not None and table.shape[-1] not in (2**num_bits,):
        raise ValueError(
            f"table has {table.shape[-1]} entries, expected {2**num_bits}"
        )

    if interpret is None:
        interpret = _interpret_default()

    if x.dtype == jnp.float16 and not interpret and not _mosaic_f16_ok():
        # Mosaic on v5e has no f16 vector type (kernel_config.DeviceProfile
        # .mosaic_f16): compute the compiled path in f32 — strictly tighter
        # numerics than native f16 — and round the result once. The
        # interpreter (CPU tests) still exercises true f16. An explicit
        # config is kept only if it fits the f32 VMEM model (the 32-bit
        # dequant path holds ~2x the intermediates, kernel_config.py);
        # otherwise re-select for f32 block/VMEM limits.
        from flute_tpu.ops.kernel_config import is_config_supported

        cfg32 = config
        if cfg32 is not None and not is_config_supported(
            cfg32, m, n, k, num_bits, group_size, dtype=jnp.float32
        ):
            cfg32 = None
        y = lut_qgemm(
            x.astype(jnp.float32),
            planes,
            scales.astype(jnp.float32),
            table,
            num_bits=num_bits,
            config=cfg32,
            pair_values=pair_values,
            interpret=interpret,
            layout=layout,
        )
        return y.astype(jnp.float16)

    if config is None:
        config = get_kernel_config(
            m, n, k, num_bits, group_size, dtype=x.dtype, layout=layout
        )
    else:
        config = fit_config(config, m, n, k, num_bits, group_size)
    if pair_values is not None and config.lut_mode != "pair_lut":
        import dataclasses as _dc

        config = _dc.replace(config, lut_mode="pair_lut")

    x2 = x.reshape(m, k)
    m_pad = -(-m // config.block_m) * config.block_m
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    y = _lut_qgemm_2d(
        x2,
        planes,
        scales,
        table if table is not None else jnp.zeros((2 ** num_bits,), jnp.float32),
        pair_values,
        num_bits=num_bits,
        config=config,
        interpret=interpret,
        layout=layout,
    )
    if m_pad != m:
        y = y[:m]
    return y.reshape(*batch, n)


def qgemm(
    x: jnp.ndarray,
    qweight,
    scales: jnp.ndarray,
    table: jnp.ndarray,
    num_bits: int,
    group_size: int,
    config: KernelConfig | None = None,
    pair_values: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference-API-shaped alias (role of flute.qgemm, reference
    flute/__init__.py:12-29): explicit num_bits/group_size arguments with a
    config handle in place of (template_id, num_sms)."""
    k = x.shape[-1]
    if scales.shape[0] != k // group_size:
        raise ValueError(
            f"scales shape {scales.shape} inconsistent with K={k}, "
            f"group_size={group_size}"
        )
    return lut_qgemm(
        x, qweight, scales, table, num_bits=num_bits, config=config,
        pair_values=pair_values,
    )
