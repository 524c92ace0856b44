"""Kernel-native weight packing for the TPU LUT-GEMM.

Role-equivalent of the reference's ``flute/utils.py`` pack/unpack/reconstruct
(reference: flute/utils.py:59-299, 347-407), with a layout designed for the
TPU VPU instead of the SM80 MMA thread mapping.

Logical format
--------------
* ``codes``:  int32 ``[K, N]`` — b-bit indices into a 2^b-entry table, laid
  out so that ``y = x[M, K] @ (table[codes] * scales_expanded)``.
* ``scales``: ``[K // group_size, N]`` — per-(K-group, output-channel).

Packed format: K-pair fields in int32 lane words
------------------------------------------------
The kernel processes weights in *K-adjacent pairs* so that one 32-bit lane
word can carry a packed (bf16, bf16) payload for two consecutive K rows —
``pltpu.bitcast(int32[R, N] -> bfloat16[2R, N])`` interleaves exactly those
rows for free. This is the TPU-native analogue of the reference's paired
``qmap2`` lookup (reference: flute/utils.py make_qmap2_from_qmap;
flute/csrc/packbits_utils.hpp:27-144 vectorized pair dequant).

Each bit-plane (bitutils.PLANE_DECOMPOSITION; 3-bit = 2+1 planes, the
TPU answer to the reference's dual-tensor Q/Q2 3-bit layout,
flute/utils.py:137-253) packs independently:

  pair field of plane p = ce_p | co_p << pb      (2*pb bits)

where (ce, co) are the plane's sub-codes for K rows (2j, 2j+1). Fields are
chunked along K (chunk = 256 K-rows = 128 pairs): within a chunk, int32
word ``w[j, n]`` holds, in LSB-first field ``i``, the pair at pair-row
``i * Kc + j`` (Kc = chunk * pb / 32). The kernel-side unpack is r = 16/pb
static shift+mask ops per word producing r contiguous pair-row slabs that
concatenate in order — no shuffles, no cross-lane traffic.

Packed plane shapes for ``[K, N]`` codes (same byte counts as the logical
bit-width — zero overhead):
  4-bit: one plane  ``[K//8,  N]`` int32
  2-bit: one plane  ``[K//16, N]`` int32
  3-bit: two planes ``[K//16, N]`` + ``[K//32, N]`` int32
  8-bit: one plane  ``[K//4,  N]`` int32

``reconstruct``/``unpack_via_kernel`` keep the reference's
kernel-as-its-own-inverse contract (flute/utils.py:347-407): reconstruction
runs the real GEMM with an identity input; unpack recovers raw codes by
reconstructing with an identity table — the compatibility linchpin used by
tensor-parallel resharding and checkpoint migration.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flute_tpu import bitutils

DEFAULT_CHUNK = 256  # K rows per pack chunk (= 128 K-pairs)


@dataclasses.dataclass(frozen=True)
class PackFormat:
    """Describes the packed layout of a quantized weight.

    The analogue of the reference's per-template tile layout metadata
    (reference: flute/utils.py:269-299). Kernel block_k must be a multiple
    of ``chunk``.
    """

    num_bits: int
    chunk: int = DEFAULT_CHUNK

    def __post_init__(self):
        bitutils.planes_for_bits(self.num_bits)  # validate
        for pb in self.plane_bits:
            r = bitutils.WORD_BITS // (2 * pb)  # pair fields per word
            if (self.chunk // 2) % r != 0:
                raise ValueError(
                    f"chunk={self.chunk} incompatible with plane of {pb} bits"
                )

    @property
    def plane_bits(self) -> tuple[int, ...]:
        return bitutils.planes_for_bits(self.num_bits)

    def plane_rows(self, k: int, plane_index: int) -> int:
        pb = self.plane_bits[plane_index]
        return k * pb // bitutils.WORD_BITS

    def packed_shapes(self, k: int, n: int) -> list[tuple[int, int]]:
        return [(self.plane_rows(k, i), n) for i in range(len(self.plane_bits))]

    def validate_k(self, k: int) -> None:
        if k % self.chunk != 0:
            raise ValueError(
                f"K={k} must be a multiple of pack chunk {self.chunk} "
                f"(zero-pad K before packing)"
            )


def _pack_pair_plane_np(
    pair_codes: np.ndarray, field_bits: int, chunk_pairs: int
) -> np.ndarray:
    """Pack ``[P, N]`` pair fields into ``[P*fb/32, N]`` int32 words."""
    p, n = pair_codes.shape
    r = bitutils.WORD_BITS // field_bits
    kc = chunk_pairs // r
    x = pair_codes.reshape(p // chunk_pairs, r, kc, n).astype(np.uint32)
    out = np.zeros((p // r, n), np.uint32)
    for c in range(p // chunk_pairs):
        w = np.zeros((kc, n), np.uint32)
        for i in range(r):
            w |= x[c, i] << (field_bits * i)
        out[c * kc:(c + 1) * kc] = w
    return out.view(np.int32)


def _unpack_pair_plane_np(
    words: np.ndarray, field_bits: int, chunk_pairs: int
) -> np.ndarray:
    """Inverse of :func:`_pack_pair_plane_np` -> ``[P, N]`` pair fields."""
    rows, n = words.shape
    r = bitutils.WORD_BITS // field_bits
    kc = chunk_pairs // r
    w = words.view(np.uint32)
    mask = (1 << field_bits) - 1
    out = np.zeros((rows * r, n), np.int64)
    for c in range(rows // kc):
        blk = w[c * kc:(c + 1) * kc]
        for i in range(r):
            out[c * chunk_pairs + i * kc:(c * chunk_pairs) + (i + 1) * kc] = (
                (blk >> (field_bits * i)) & mask
            )
    return out


def pack_np(
    codes: np.ndarray,
    num_bits: int,
    *,
    chunk: int = DEFAULT_CHUNK,
    use_native: bool = True,
) -> list[np.ndarray]:
    """Pack ``[K, N]`` b-bit codes into kernel-native int32 plane arrays.

    Uses the threaded C++ packer (flute_tpu/csrc/fastpack.cpp) when
    available; the numpy path below is the reference implementation the
    native one is tested against.
    """
    fmt = PackFormat(num_bits=num_bits, chunk=chunk)
    k, n = codes.shape
    fmt.validate_k(k)
    if use_native:
        from flute_tpu import native

        if native.available():
            codes_i32 = np.ascontiguousarray(codes, dtype=np.int32)
            out = []
            shift = 0
            for pb in fmt.plane_bits:
                out.append(native.pack_plane(codes_i32, shift, pb, chunk))
                shift += pb
            return out
    codes = np.asarray(codes).astype(np.int64)
    out = []
    shift = 0
    for pb in fmt.plane_bits:
        sub = (codes >> shift) & ((1 << pb) - 1)
        shift += pb
        pairs = sub[0::2] | (sub[1::2] << pb)  # [K/2, N] pair fields
        out.append(_pack_pair_plane_np(pairs, 2 * pb, chunk // 2))
    return out


def pack(
    codes,
    num_bits: int,
    *,
    chunk: int = DEFAULT_CHUNK,
    wide: bool = False,
) -> list[jnp.ndarray]:
    """JAX-array-returning wrapper over :func:`pack_np` (packing is offline
    host work; numpy is the natural engine)."""
    if wide:
        return [jnp.asarray(p) for p in pack_w3_wide_np(np.asarray(codes), chunk=chunk)]
    return [jnp.asarray(p) for p in pack_np(np.asarray(codes), num_bits, chunk=chunk)]


# ---------------------------------------------------------------------------
# Wide 3-bit layout: single plane, 16 six-bit pair fields per 3-word group
# ---------------------------------------------------------------------------
#
# The classic 3-bit layout splits codes into 2-bit + 1-bit planes (the
# TPU answer to the reference's Q/Q2 dual-tensor scheme,
# flute/utils.py:137-253) — but pays a double unpack + OR-stitch in the
# kernel. The wide layout instead stores the 6-bit *pair field*
# (ce | co << 3) directly: 16 fields occupy exactly three int32 words
# (96 bits, zero waste), laid out *planar* per chunk — all first words of
# the 3-word groups first (one 8-sublane slab per cp/16 triples), then all
# second words, then all third — so extraction is a contiguous-sublane
# shift+mask per field position (two positions straddle a word boundary
# and take one extra shift+or). The kernel then needs only a single
# chainless 8-entry gather per side, with the raw field as the even index
# (hardware mod-8 wrap) and one shift for the odd. Measured ~25% faster
# than the dual-plane layout on v5e (docs/KERNEL_NOTES.md round 2).


def pack_w3_wide_np(
    codes: np.ndarray,
    *,
    chunk: int = DEFAULT_CHUNK,
    use_native: bool = True,
) -> list[np.ndarray]:
    """Pack ``[K, N]`` 3-bit codes into the wide single-plane layout
    (int32 ``[3K/32, N]``). Uses the threaded C++ packer when available;
    the numpy path below is the reference it is tested against."""
    k, n = codes.shape
    if k % chunk != 0:
        raise ValueError(f"K={k} must be a multiple of pack chunk {chunk}")
    cp = chunk // 2
    if chunk % 256 != 0:
        # the kernel gathers 8-sublane slabs of triples: cp/16 must be a
        # multiple of 8
        raise ValueError(f"chunk={chunk} incompatible with wide 3-bit layout")
    if use_native:
        from flute_tpu import native

        if native.available():
            return [native.pack_w3_wide(codes, chunk)]
    pairs = (codes[0::2] | (codes[1::2] << 3)).astype(np.uint64)  # [K/2, N]
    nch = (k // 2) // cp
    ntrip = cp // 16
    pr = pairs.reshape(nch, 16, ntrip, n)  # [c, j, t, n]
    grp = np.zeros((nch, 3, ntrip, n), np.uint64)
    for j in range(16):
        bit = 6 * j
        w, off = bit // 32, bit % 32
        grp[:, w] |= (pr[:, j] << off) & 0xFFFFFFFF
        if off + 6 > 32:
            grp[:, w + 1] |= pr[:, j] >> (32 - off)
    out = grp.reshape(k * 3 // 32, n).astype(np.uint32)
    return [out.view(np.int32)]


def unpack_w3_wide_np(
    plane: np.ndarray,
    *,
    chunk: int = DEFAULT_CHUNK,
    use_native: bool = True,
) -> np.ndarray:
    """Inverse of :func:`pack_w3_wide_np` -> ``[K, N]`` int32 codes."""
    rows, n = np.asarray(plane).shape
    k = rows * 32 // 3
    if use_native:
        from flute_tpu import native

        if native.available():
            return native.unpack_w3_wide(np.asarray(plane), chunk)
    cp = chunk // 2
    ntrip = cp // 16
    w = np.asarray(plane).view(np.uint32).reshape(k // chunk, 3, ntrip, n).astype(np.uint64)
    pf = np.empty((k // chunk, 16, ntrip, n), np.uint64)
    for j in range(16):
        bit = 6 * j
        a, off = bit // 32, bit % 32
        if off + 6 <= 32:
            pf[:, j] = (w[:, a] >> off) & 0x3F
        else:
            pf[:, j] = ((w[:, a] >> off) | (w[:, a + 1] << (32 - off))) & 0x3F
    pairs = pf.reshape(k // 2, n)
    codes = np.empty((k, n), np.int64)
    codes[0::2] = pairs & 7
    codes[1::2] = pairs >> 3
    return codes.astype(np.int32)


def pack_w3_wide_jnp(
    codes: jnp.ndarray, *, chunk: int = DEFAULT_CHUNK
) -> list[jnp.ndarray]:
    """On-device (jittable) wide 3-bit pack — same layout as
    :func:`pack_w3_wide_np`."""
    k, n = codes.shape
    if k % chunk != 0 or chunk % 256 != 0:
        raise ValueError(f"K={k}/chunk={chunk} invalid for wide 3-bit")
    cp = chunk // 2
    c = codes.astype(jnp.uint32)
    pairs = c[0::2] | (c[1::2] << 3)  # [K/2, N]
    nch = (k // 2) // cp
    ntrip = cp // 16
    pr = pairs.reshape(nch, 16, ntrip, n)
    grp = [jnp.zeros((nch, ntrip, n), jnp.uint32) for _ in range(3)]
    for j in range(16):
        bit = 6 * j
        w, off = bit // 32, bit % 32
        grp[w] = grp[w] | ((pr[:, j] << off) & jnp.uint32(0xFFFFFFFF))
        if off + 6 > 32:
            grp[w + 1] = grp[w + 1] | (pr[:, j] >> (32 - off))
    out = jnp.stack(grp, axis=1).reshape(k * 3 // bitutils.WORD_BITS, n)
    return [lax.bitcast_convert_type(out, jnp.int32)]


# ---------------------------------------------------------------------------
# Sign-symmetric 4-bit layout ("w4sym"): byte-aligned pair fields
# ---------------------------------------------------------------------------
#
# For tables satisfying table[c + 8] == -table[c] (sign-symmetric grids —
# e.g. nf_values(4, symmetric=True) reordered to sign-magnitude codes), the
# 16-entry lookup factors into an 8-entry *magnitude* gather plus a sign-bit
# XOR — eliminating the 2-gather+compare+select chain that caps the general
# W4 kernel at ~52-56% of the v5e roofline (docs/KERNEL_NOTES.md).
#
# Code semantics: c = s * 8 + m (sign-magnitude).  Pair field (one byte):
#
#   f = m_e | m_o << 3 | s_e << 6 | s_o << 7
#
# Four fields per int32 word in the standard chunked pair-plane arrangement
# (_pack_pair_plane_np with field_bits=8), so the plane shape is [K/8, N] —
# identical byte count to classic W4. The kernel reads each field with three
# chainless 8-entry sublane gathers, all index windows plain shifts of the
# *word* (the hardware mod-8 index wrap eats every high bit): m_e at
# bits 0-2, m_o at bits 3-5, and the sign pair at bits 6-7 through a
# 4-entry sign-mask table duplicated over index bit 2. Payload =
# (ge | go) ^ gs. Because the layout has the same plane shape as classic
# W4, it cannot be shape-detected: callers must carry layout="w4sym"
# metadata (QuantizedLinear.layout / lut_qgemm(layout=...)).


def pack_w4_sym_np(
    codes: np.ndarray,
    *,
    chunk: int = DEFAULT_CHUNK,
    use_native: bool = True,
) -> list[np.ndarray]:
    """Pack ``[K, N]`` 4-bit sign-magnitude codes (c = s*8 + m) into the
    sign-symmetric byte-field layout (single int32 plane ``[K/8, N]``)."""
    k, n = codes.shape
    if k % chunk != 0:
        raise ValueError(f"K={k} must be a multiple of pack chunk {chunk}")
    if use_native:
        from flute_tpu import native

        if native.available():
            packed = native.pack_w4_sym(codes, chunk)
            if packed is not None:
                return [packed]
    c = np.asarray(codes).astype(np.uint32)
    ce, co = c[0::2], c[1::2]
    f = (ce & 7) | ((co & 7) << 3) | ((ce >> 3) << 6) | ((co >> 3) << 7)
    return [_pack_pair_plane_np(f, 8, chunk // 2)]


def unpack_w4_sym_np(
    plane: np.ndarray,
    *,
    chunk: int = DEFAULT_CHUNK,
    use_native: bool = True,
) -> np.ndarray:
    """Inverse of :func:`pack_w4_sym_np` -> ``[K, N]`` int32 codes."""
    if use_native:
        from flute_tpu import native

        if native.available():
            codes = native.unpack_w4_sym(np.asarray(plane), chunk)
            if codes is not None:
                return codes
    f = _unpack_pair_plane_np(np.asarray(plane), 8, chunk // 2)
    p, n = f.shape
    codes = np.empty((2 * p, n), np.int64)
    codes[0::2] = (f & 7) | (((f >> 6) & 1) << 3)
    codes[1::2] = ((f >> 3) & 7) | (((f >> 7) & 1) << 3)
    return codes.astype(np.int32)


def pack_w4_sym_jnp(
    codes: jnp.ndarray, *, chunk: int = DEFAULT_CHUNK
) -> list[jnp.ndarray]:
    """On-device (jittable) w4sym pack — same layout as
    :func:`pack_w4_sym_np`."""
    k, n = codes.shape
    if k % chunk != 0:
        raise ValueError(f"K={k} must be a multiple of pack chunk {chunk}")
    c = codes.astype(jnp.uint32)
    ce, co = c[0::2], c[1::2]
    f = (ce & 7) | ((co & 7) << 3) | ((ce >> 3) << 6) | ((co >> 3) << 7)
    cp = chunk // 2
    r = 4  # byte fields per word
    kc = cp // r
    x = f.reshape(k // chunk, r, kc, n)
    shifts = (8 * jnp.arange(r, dtype=jnp.uint32))[None, :, None, None]
    words = jax.lax.reduce(
        x << shifts, jnp.uint32(0), jax.lax.bitwise_or, dimensions=(1,)
    )
    return [
        lax.bitcast_convert_type(words.reshape(k // 8, n), jnp.int32)
    ]


def sym_code_order(table_ascending: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Map an ascending sign-symmetric table to sign-magnitude code order.

    For an ascending table of 2^b entries with v[i] == -v[2^b-1-i], returns
    ``(table_sym, perm)`` where ``table_sym[c]`` is the value of
    sign-magnitude code c (``table_sym[c + H] == -table_sym[c]``, H=2^(b-1))
    and ``perm`` maps ascending-order codes to sign-magnitude codes
    (``code_sym = perm[code_ascending]``).
    """
    v = np.asarray(table_ascending, np.float32)
    e = v.shape[0]
    h = e // 2
    if not np.allclose(v[: h][::-1], -v[h:], rtol=0, atol=1e-6 * np.abs(v).max()):
        raise ValueError("table is not sign-symmetric (v[i] != -v[e-1-i])")
    table_sym = np.concatenate([v[h:], -v[h:]])  # mags = positive half asc
    perm = np.empty(e, np.int64)
    for a in range(e):
        perm[a] = (a - h) if a >= h else (h + (h - 1 - a))
    return table_sym.astype(np.float32), perm


def is_symmetric_table(table, num_bits: int) -> bool:
    """True when ``table`` (sign-magnitude order) satisfies the w4sym
    contract table[c + H] == -table[c] exactly (including -0.0 == -(0.0))."""
    t = np.asarray(table, np.float32)
    e = 2 ** num_bits
    if t.shape[-1] != e:
        return False
    h = e // 2
    lo = t[..., :h].view(np.uint32)
    hi = t[..., h:].view(np.uint32)
    return bool(np.all(hi == (lo ^ np.uint32(0x80000000))))


def is_ascending_symmetric_table(table, num_bits: int) -> bool:
    """True for an ascending table with ``v[i] == -v[2^b-1-i]`` exactly —
    the other common presentation of a sign-symmetric grid (e.g. a
    learnable/NFL table kept sorted for searchsorted). Convert with
    :func:`sym_code_order` before packing w4sym."""
    t = np.asarray(table, np.float32)
    e = 2 ** num_bits
    if t.shape[-1] != e or np.any(np.diff(t) < 0):
        return False
    a = t.view(np.uint32)
    b = t[..., ::-1].copy().view(np.uint32)
    return bool(np.all(a == (b ^ np.uint32(0x80000000))))


def is_w3_wide(planes, num_bits: int, k: int) -> bool:
    """Detect the wide 3-bit layout from plane structure (single plane of
    3K/32 rows vs the classic 2-plane (2K/32, K/32) split)."""
    if num_bits != 3:
        return False
    return len(planes) == 1 and planes[0].shape[0] == k * 3 // bitutils.WORD_BITS


def pack_jnp(
    codes: jnp.ndarray,
    num_bits: int,
    *,
    chunk: int = DEFAULT_CHUNK,
) -> list[jnp.ndarray]:
    """On-device (jittable) packing — same layout as :func:`pack_np`.

    Exists because device->host->device round trips can be catastrophically
    slow on remote-attached TPUs; quantize-and-pack pipelines that already
    hold codes on device should stay there.
    """
    fmt = PackFormat(num_bits=num_bits, chunk=chunk)
    k, n = codes.shape
    fmt.validate_k(k)
    codes = codes.astype(jnp.uint32)
    out = []
    shift = 0
    for pb in fmt.plane_bits:
        sub = (codes >> shift) & ((1 << pb) - 1)
        shift += pb
        pairs = sub[0::2] | (sub[1::2] << pb)  # [K/2, N]
        fb = 2 * pb
        r = bitutils.WORD_BITS // fb
        cp = chunk // 2
        kc = cp // r
        x = pairs.reshape(k // chunk, r, kc, n)
        shifts = (fb * jnp.arange(r, dtype=jnp.uint32))[None, :, None, None]
        words = jax.lax.reduce(
            x << shifts,
            jnp.uint32(0),
            jax.lax.bitwise_or,
            dimensions=(1,),
        )  # [K/chunk, kc, N]
        out.append(
            jax.lax.bitcast_convert_type(
                words.reshape(k * pb // bitutils.WORD_BITS, n), jnp.int32
            )
        )
    return out


def unpack_np(
    planes: Sequence[np.ndarray],
    num_bits: int,
    *,
    chunk: int = DEFAULT_CHUNK,
    use_native: bool = True,
) -> np.ndarray:
    """Recover ``[K, N]`` int32 codes from packed plane arrays (host-side)."""
    if num_bits == 3 and len(planes) == 1:
        # wide single-plane 3-bit layout (classic 3-bit always has 2 planes)
        return unpack_w3_wide_np(np.asarray(planes[0]), chunk=chunk)
    fmt = PackFormat(num_bits=num_bits, chunk=chunk)
    if use_native:
        from flute_tpu import native

        if native.available():
            acc = None
            shift = 0
            for plane, pb in zip(planes, fmt.plane_bits):
                sub = native.unpack_plane(np.asarray(plane), pb, chunk)
                acc = sub << shift if acc is None else acc | (sub << shift)
                shift += pb
            return acc.astype(np.int32)
    acc = None
    shift = 0
    for plane, pb in zip(planes, fmt.plane_bits):
        pairs = _unpack_pair_plane_np(np.asarray(plane), 2 * pb, chunk // 2)
        p, n = pairs.shape
        sub = np.zeros((2 * p, n), np.int64)
        sub[0::2] = pairs & ((1 << pb) - 1)
        sub[1::2] = pairs >> pb
        acc = sub << shift if acc is None else acc | (sub << shift)
        shift += pb
    return acc.astype(np.int32)


def unpack(planes, num_bits: int, *, chunk: int = DEFAULT_CHUNK) -> jnp.ndarray:
    return jnp.asarray(
        unpack_np([np.asarray(p) for p in planes], num_bits, chunk=chunk)
    )


def reconstruct(
    planes: Sequence[jnp.ndarray],
    scales: jnp.ndarray,
    table: jnp.ndarray,
    num_bits: int,
    *,
    chunk: int = DEFAULT_CHUNK,
    use_kernel: bool = True,
    layout: str = "auto",
) -> jnp.ndarray:
    """Dequantize packed weights to ``[K, N]`` by running the GEMM with an
    identity input (the reference's ``utils.reconstruct`` contract,
    flute/utils.py:347-376)."""
    from flute_tpu.ops import lut_gemm

    if num_bits == 3 and len(planes) == 1:
        k = planes[0].shape[0] * bitutils.WORD_BITS // 3  # wide layout
    else:
        pb0 = bitutils.planes_for_bits(num_bits)[0]
        k = planes[0].shape[0] * bitutils.WORD_BITS // pb0
    eye = jnp.eye(k, dtype=scales.dtype)
    if use_kernel:
        return lut_gemm.lut_qgemm(
            eye, list(planes), scales, table, num_bits=num_bits, layout=layout
        )
    if layout == "w4sym":
        codes = jnp.asarray(unpack_w4_sym_np(np.asarray(planes[0]), chunk=chunk))
    else:
        codes = unpack(planes, num_bits, chunk=chunk)
    return lut_gemm.dequantize_codes(codes, scales, table, scales.dtype)


def unpack_via_kernel(
    planes: Sequence[jnp.ndarray],
    num_bits: int,
    n: int,
    k: int,
    *,
    layout: str = "auto",
) -> jnp.ndarray:
    """Recover codes by reconstructing with an identity table and unit scales
    — the kernel-as-its-own-inverse trick (reference flute/utils.py:379-407).
    Exact because 2^b <= 256 integers are exactly representable in bf16/f32."""
    from flute_tpu.ops import lut_gemm

    # bf16 compute for the wide layouts (their payload paths are 16-bit);
    # codes <= 255 are exactly representable either way
    if layout == "auto":
        layout = "w3wide" if is_w3_wide(planes, num_bits, k) else "plane"
    ct = jnp.bfloat16 if layout in ("w3wide", "w4sym") else jnp.float32
    if layout == "w4sym":
        # sign-distinguishing identity table honouring the symmetric
        # contract: t[c] = c+1 for magnitudes, -(m+1) for the sign half
        h = 2 ** (num_bits - 1)
        mags = jnp.arange(1, h + 1, dtype=jnp.float32)
        table = jnp.concatenate([mags, -mags])
    else:
        table = jnp.arange(2 ** num_bits, dtype=jnp.float32)
    # unit scales at group_size=64; any group size works with unit scales
    scales = jnp.ones((k // 64, n), ct)
    eye = jnp.eye(k, dtype=ct)
    deq = lut_gemm.lut_qgemm(
        eye, list(planes), scales, table, num_bits=num_bits, layout=layout
    )
    v = jnp.round(deq.astype(jnp.float32)).astype(jnp.int32)
    if layout == "w4sym":
        h = 2 ** (num_bits - 1)
        return jnp.where(v > 0, v - 1, h - 1 - v)
    return v
