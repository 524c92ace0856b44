"""NormalFloat (NF) quantization — pure jnp.

Re-implements the semantics of the reference's ``flute/nf_utils.py``:
  * ``nf_values``: table of Gaussian inverse-CDF points, normalized to
    [-1, 1], with the QLoRA NF4 table hard-coded for (bits=4, asymmetric)
    (reference: flute/nf_utils.py:14-32);
  * ``nf_pivots``: decision boundaries = midpoints between adjacent values
    (reference: flute/nf_utils.py:31);
  * ``nf_quantize``: per-group absmax scaling + searchsorted codes
    (reference: flute/nf_utils.py:36-71);
  * ``nf_quantize_fake``: kernel-faithful fake quantization — lookup and
    scale multiply rounded in the compute dtype (reference:
    flute/nf_utils.py:75-89).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as _scipy_norm

# QLoRA NF4 table (public constant; same values the reference hard-codes at
# flute/nf_utils.py:29).
QLORA_NF4 = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=np.float32,
)


def nf_values(num_bits: int = 4, symmetric: bool = False) -> jnp.ndarray:
    """NormalFloat code values, float32, ascending, normalized to [-1, 1]."""
    offset = 0.5 * (1 / 32 + 1 / 30)
    if symmetric:
        probs = np.linspace(offset, 1 - offset, 2 ** num_bits)
        v = _scipy_norm.ppf(probs)
    else:
        half = 2 ** (num_bits - 1)
        p1 = np.linspace(1 - offset, 0.5, half)
        v1 = -_scipy_norm.ppf(p1)
        p2 = np.linspace(0.5, 1 - offset, half + 1)[1:]
        v2 = _scipy_norm.ppf(p2)
        v = np.concatenate([v1, v2])
    v = v / np.max(np.abs(v))
    if num_bits == 4 and not symmetric:
        v = QLORA_NF4
    return jnp.asarray(v, dtype=jnp.float32)


def nf_pivots(values: jnp.ndarray) -> jnp.ndarray:
    """Decision boundaries: midpoints between adjacent table values."""
    return (values[1:] + values[:-1]) / 2.0


def quantize_with_table(
    w: jnp.ndarray,
    values: jnp.ndarray,
    group_size: int,
    custom_scales: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Group-absmax quantize ``w`` against an arbitrary ascending table.

    ``w`` is grouped along its last axis in contiguous blocks of
    ``group_size`` (same grouping as the reference's ``view(-1, blocksize)``
    on a row-major [out, in] weight, flute/nf_utils.py:37).

    Returns (dequantized f32, codes int32, scales) with shapes
    (w.shape, w.shape, w.shape[:-1] + (K//group_size,)).
    """
    pivots = nf_pivots(values)
    orig_shape = w.shape
    qx = w.astype(jnp.float32).reshape(-1, group_size)
    if custom_scales is not None:
        absmax = custom_scales.astype(jnp.float32).reshape(-1, 1)
    else:
        absmax = jnp.max(jnp.abs(qx), axis=1, keepdims=True)
    # Guard all-zero groups (reference would produce NaN here too; we pick 1).
    absmax = jnp.where(absmax == 0, 1.0, absmax)
    normalized = qx / absmax
    codes = jnp.searchsorted(pivots, normalized, side="left").astype(jnp.int32)
    deq = values[codes] * absmax
    scales_shape = orig_shape[:-1] + (orig_shape[-1] // group_size,)
    return (
        deq.reshape(orig_shape),
        codes.reshape(orig_shape),
        absmax.reshape(scales_shape),
    )


def quantize_with_table_np(
    w: np.ndarray,
    values: np.ndarray,
    group_size: int,
    custom_scales: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (numpy) twin of :func:`quantize_with_table` for streaming
    checkpoint quantization — identical codes/scales, no device round-trip.

    Returns (codes int32, scales f32); the dequantized tensor is omitted on
    purpose (streaming callers never materialize it).
    """
    values = np.asarray(values, np.float32)
    pivots = (values[1:] + values[:-1]) / 2.0
    orig_shape = w.shape
    qx = np.asarray(w, np.float32).reshape(-1, group_size)
    if custom_scales is not None:
        absmax = np.asarray(custom_scales, np.float32).reshape(-1, 1)
    else:
        absmax = np.max(np.abs(qx), axis=1, keepdims=True)
    absmax = np.where(absmax == 0, 1.0, absmax)
    codes = np.searchsorted(pivots, qx / absmax, side="left").astype(np.int32)
    scales_shape = orig_shape[:-1] + (orig_shape[-1] // group_size,)
    return codes.reshape(orig_shape), absmax.reshape(scales_shape).astype(
        np.float32
    )


def nf_quantize_np(
    w: np.ndarray,
    num_bits: int,
    group_size: int,
    custom_scales: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side NF quantize: returns (codes, scales, table)."""
    values = np.asarray(nf_values(num_bits, symmetric=False))
    codes, scales = quantize_with_table_np(w, values, group_size, custom_scales)
    return codes, scales, values


def nf_quantize(
    w: jnp.ndarray,
    num_bits: int,
    group_size: int,
    custom_scales: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NF-quantize a weight (role of reference flute/nf_utils.py:50-71).

    Returns (dequantized, codes, scales, table).
    """
    values = nf_values(num_bits, symmetric=False)
    deq, codes, scales = quantize_with_table(w, values, group_size, custom_scales)
    return deq, codes, scales, values


def nf_values_symmetric_exact(num_bits: int) -> np.ndarray:
    """Ascending sign-symmetric NF table, symmetrized at the bit level
    (``v[i] == -v[2^b-1-i]`` exactly) so it satisfies the w4sym kernel
    layout contract after any rounding (sign flips are exact in every IEEE
    dtype). Host-side numpy (table construction is offline math)."""
    v = np.asarray(nf_values(num_bits, symmetric=True), np.float64)
    v = (v - v[::-1]) / 2.0  # cancel scipy.ppf roundoff asymmetry
    v = v / np.max(np.abs(v))
    return v.astype(np.float32)


def nf_quantize_symmetric(
    w: jnp.ndarray,
    num_bits: int,
    group_size: int,
    custom_scales: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sign-symmetric NF quantization for the w4sym kernel layout.

    Returns (dequantized, codes, scales, table) where codes are
    *sign-magnitude* (c = s*2^(b-1) + m) and the returned table is in code
    order with ``table[c + 2^(b-1)] == -table[c]``.
    """
    from flute_tpu.packing import sym_code_order

    v = nf_values_symmetric_exact(num_bits)
    table_sym, perm = sym_code_order(v)
    deq, codes_asc, scales = quantize_with_table(
        w, jnp.asarray(v), group_size, custom_scales
    )
    codes = jnp.asarray(perm, jnp.int32)[codes_asc]
    return deq, codes, scales, jnp.asarray(table_sym)


def nf_quantize_symmetric_np(
    w: np.ndarray,
    num_bits: int,
    group_size: int,
    custom_scales: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side twin of :func:`nf_quantize_symmetric` for streaming
    checkpoint quantization. Returns (codes, scales, table)."""
    from flute_tpu.packing import sym_code_order

    v = nf_values_symmetric_exact(num_bits)
    table_sym, perm = sym_code_order(v)
    codes_asc, scales = quantize_with_table_np(w, v, group_size, custom_scales)
    return perm[codes_asc].astype(np.int32), scales, table_sym


def nf_quantize_fake(
    w: jnp.ndarray,
    num_bits: int,
    group_size: int,
    dtype,
    symmetric: bool = False,
) -> jnp.ndarray:
    """Kernel-faithful fake quantization: table lookup and scale multiply are
    rounded in ``dtype`` exactly as the kernel computes them (role of
    reference flute/nf_utils.py:75-89). ``symmetric`` mirrors the
    sign-symmetric grid used by the w4sym kernel layout."""
    if symmetric:
        values = jnp.asarray(nf_values_symmetric_exact(num_bits))
    else:
        values = nf_values(num_bits, symmetric=False)
    _, codes, scales = quantize_with_table(w, values, group_size)
    t = values.astype(dtype)
    s = jnp.repeat(scales.astype(dtype), group_size, axis=-1).reshape(w.shape)
    return (t[codes] * s).astype(dtype)
