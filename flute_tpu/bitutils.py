"""Bit-level packing primitives (pure jnp).

Role-equivalent of the reference's ``flute/packbits_utils.py`` (uint8 <->
bitplane conversions, bitvector <-> integer-word packing), redesigned around
int32 lane words — the natural register width of the TPU VPU — instead of the
reference's int16 CUDA layout.

The *word layout* here is the one the Pallas kernel unpacks with nothing but
static shifts, masks and sublane concatenation; see flute_tpu/packing.py for
the chunked K-major layout built on top of these primitives.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Number of bits in a packed lane word.
WORD_BITS = 32

# A "plane decomposition" expresses a bit-width as a sum of power-of-two
# plane widths so that every plane divides 32 evenly. This is the TPU-native
# answer to the reference's dual-tensor 3-bit layout (reference:
# flute/utils.py:137-253 splits 3-bit into a 2-bit-ish Q and a stitch plane
# Q2): we store 3-bit codes as a 2-bit plane (low bits) plus a 1-bit plane
# (high bit), each of which packs cleanly into int32 words.
PLANE_DECOMPOSITION: dict[int, tuple[int, ...]] = {
    1: (1,),
    2: (2,),
    3: (2, 1),
    4: (4,),
    8: (8,),
}


def planes_for_bits(num_bits: int) -> tuple[int, ...]:
    if num_bits not in PLANE_DECOMPOSITION:
        raise ValueError(f"Unsupported num_bits: {num_bits}")
    return PLANE_DECOMPOSITION[num_bits]


def plane_split(codes: jnp.ndarray, num_bits: int) -> list[jnp.ndarray]:
    """Split b-bit codes into per-plane sub-codes (low planes first)."""
    planes = planes_for_bits(num_bits)
    out = []
    shift = 0
    codes = codes.astype(jnp.int32)
    for pb in planes:
        out.append((codes >> shift) & ((1 << pb) - 1))
        shift += pb
    return out


def plane_merge(parts: list[jnp.ndarray], num_bits: int) -> jnp.ndarray:
    """Inverse of :func:`plane_split`."""
    planes = planes_for_bits(num_bits)
    assert len(parts) == len(planes)
    acc = jnp.zeros_like(parts[0].astype(jnp.int32))
    shift = 0
    for pb, part in zip(planes, parts):
        acc = acc | (part.astype(jnp.int32) << shift)
        shift += pb
    return acc


def pack_plane_words(sub_codes: jnp.ndarray, plane_bits: int) -> jnp.ndarray:
    """Pack ``[r, Kc, ...]`` sub-codes into ``[Kc, ...]`` int32 words.

    Word ``w[j]`` holds ``sub_codes[i, j]`` in bit-field ``i`` (LSB-first),
    i.e. bit-field ``i`` of word ``j`` stores the code whose *unpack* position
    is ``i * Kc + j``. The kernel-side inverse is r static shift+mask ops
    followed by a sublane-axis concatenation — no interleave, no permutation.
    """
    r = WORD_BITS // plane_bits
    if sub_codes.shape[0] != r:
        raise ValueError(f"Leading dim must be {r}, got {sub_codes.shape}")
    acc = jnp.zeros(sub_codes.shape[1:], dtype=jnp.int32)
    for i in range(r):
        acc = acc | (sub_codes[i].astype(jnp.int32) << (plane_bits * i))
    return acc


def unpack_plane_words(words: jnp.ndarray, plane_bits: int) -> jnp.ndarray:
    """Inverse of :func:`pack_plane_words`: ``[Kc, ...]`` -> ``[r, Kc, ...]``."""
    r = WORD_BITS // plane_bits
    mask = (1 << plane_bits) - 1
    return jnp.stack([(words >> (plane_bits * i)) & mask for i in range(r)], axis=0)


def np_pack_plane_words(sub_codes: np.ndarray, plane_bits: int) -> np.ndarray:
    """NumPy twin of :func:`pack_plane_words` for host-side offline packing."""
    r = WORD_BITS // plane_bits
    if sub_codes.shape[0] != r:
        raise ValueError(f"Leading dim must be {r}, got {sub_codes.shape}")
    acc = np.zeros(sub_codes.shape[1:], dtype=np.int64)
    for i in range(r):
        acc |= sub_codes[i].astype(np.int64) << (plane_bits * i)
    # Wrap to int32 (the top field of the top plane may set the sign bit).
    return acc.astype(np.uint64).astype(np.uint32).view(np.int32)
