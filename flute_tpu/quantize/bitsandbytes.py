"""bitsandbytes NF4/FP4 checkpoint import — pure tensor math, no bnb runtime.

Role-equivalent of the reference's ``flute/integrations/bitsandbytes.py``
(``convert_BNBLinear4bit``, bitsandbytes.py:10-91): decode a BNB
``Linear4bit``'s packed nibbles and (possibly double-quantized) absmax
scales into the (codes, scales, table) triple, then pack for the TPU
kernel. The reference verifies its decode against bnb's own
``dequantize_4bit``; here the decode IS the implementation, verified by
round-trip tests against an independent numpy reference.

BNB 4-bit storage format:
  * ``qweight``: uint8 [numel/2] — two 4-bit codes per byte, FIRST element
    in the HIGH nibble;
  * ``absmax``: per-block (blocksize, default 64) scale. With double
    quantization ("nested"), absmax is itself uint8-quantized per
    ``nested_blocksize`` (256) blocks: absmax = code2[absmax_q] *
    nested_absmax + nested_offset, where code2 is bnb's dynamic-quant map;
  * ``code``: [16] float table (NF4 or FP4), ascending for NF4.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from flute_tpu.nn import QuantizedLinear, from_codes


@dataclasses.dataclass
class BNBQuantState:
    """Array-level view of a bnb Linear4bit quant_state (torch-free)."""

    code: np.ndarray  # [16] float quantization table
    absmax: np.ndarray  # per-block scales (uint8 if nested, float otherwise)
    blocksize: int  # weights per absmax block (default 64)
    shape: tuple[int, int]  # [out_features, in_features]
    # double ("nested") quantization of absmax:
    nested_code: Optional[np.ndarray] = None  # [256] float
    nested_absmax: Optional[np.ndarray] = None  # per-256-block float scales
    nested_blocksize: int = 256
    offset: Optional[float] = None  # global absmax offset


def decode_absmax(state: BNBQuantState) -> np.ndarray:
    """Dequantize the (possibly nested) absmax to float32 (reference
    dequantizes via bnb functional, bitsandbytes.py:37-52)."""
    if state.nested_code is None:
        return np.asarray(state.absmax, np.float32)
    aq = np.asarray(state.absmax).astype(np.int64).reshape(-1)
    vals = np.asarray(state.nested_code, np.float32)[aq]
    nb = state.nested_blocksize
    scales = np.asarray(state.nested_absmax, np.float32)
    pad = (-len(vals)) % nb
    v = np.pad(vals, (0, pad)).reshape(-1, nb)
    v = v * scales[: v.shape[0], None]
    out = v.reshape(-1)[: len(vals)]
    if state.offset is not None:
        out = out + np.float32(state.offset)
    return out


def unpack_nibbles(qweight: np.ndarray, numel: int) -> np.ndarray:
    """uint8 packed nibbles -> int32 codes [numel]; first element of each
    pair sits in the HIGH nibble (bnb convention)."""
    q = np.asarray(qweight, np.uint8).reshape(-1)
    hi = (q >> 4).astype(np.int32)
    lo = (q & 0xF).astype(np.int32)
    out = np.empty(q.size * 2, np.int32)
    out[0::2] = hi
    out[1::2] = lo
    return out[:numel]


def dequantize_bnb(state: BNBQuantState, qweight: np.ndarray) -> np.ndarray:
    """Full independent dequantization (for verification)."""
    n, k = state.shape
    codes = unpack_nibbles(qweight, n * k)
    absmax = decode_absmax(state)
    vals = np.asarray(state.code, np.float32)[codes]
    bs = state.blocksize
    w = vals.reshape(-1, bs) * absmax[: vals.size // bs, None]
    return w.reshape(n, k)


def convert_bnb_linear4bit(
    qweight: np.ndarray,
    state: BNBQuantState,
    *,
    bias: Optional[np.ndarray] = None,
    dtype=jnp.bfloat16,
    verify: bool = True,
    **kw,
) -> QuantizedLinear:
    """Convert a BNB Linear4bit into a packed :class:`QuantizedLinear`
    (role of reference convert_BNBLinear4bit, bitsandbytes.py:10-91).

    BNB's table must be ascending for our searchsorted-based tooling; NF4
    is. Group size = bnb blocksize. The weight layout maps directly: bnb
    blocks run along the input dim of the row-major [out, in] weight, which
    is exactly our per-K-group grouping after the transpose.
    """
    n, k = state.shape
    if k % state.blocksize:
        raise ValueError(f"in_features {k} not a multiple of blocksize")
    codes = unpack_nibbles(qweight, n * k).reshape(n, k)
    absmax = decode_absmax(state).reshape(n, k // state.blocksize)
    table = np.asarray(state.code, np.float32)
    if not np.all(np.diff(table) > 0):
        raise ValueError("bnb code table must be ascending (NF4 is; FP4 is not)")

    if verify:
        want = dequantize_bnb(state, qweight)
        got = table[codes] * np.repeat(absmax, state.blocksize, axis=1)
        if not np.allclose(got, want, rtol=0, atol=0):
            raise AssertionError("lossless bnb decode verification failed")

    return from_codes(
        codes.T.astype(np.int32),  # [K, N]
        jnp.asarray(absmax.T, dtype),  # [K/g, N]
        table=jnp.asarray(table),
        num_bits=4,
        group_size=state.blocksize,
        bias=None if bias is None else jnp.asarray(bias),
        **kw,
    )
