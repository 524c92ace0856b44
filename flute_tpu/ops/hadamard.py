"""Fast Walsh–Hadamard transform (FWHT) — the input pre-rotation used by
HIGGS-quantized models.

Role-equivalent of the reference's HadaCore kernel
(flute/csrc/hadamard_transform_cuda.cu:92-748: tensor-core 16x16 MMA
butterflies with movmatrix transposes; host wrapper
hadamard_transform.cpp:17-57; fused entry qgemm.cpp:201-244).

TPU-native design: H_n for n = a*b factors as H_a ⊗ H_b, so the transform
of x reshaped to [..., a, b] is ``H_a @ X @ H_b`` — two dense bf16 matmuls
that run at full MXU occupancy. This is exactly the trick HadaCore plays
on tensor cores, but on TPU the *compiler* schedules it: no custom kernel
beats two MXU matmuls for this shape class, so the idiomatic implementation
is an einsum pair, jitted and fusable into the downstream LUT-GEMM.

Supported sizes: powers of two 2^1..2^15 (reference run_fht dispatch,
hadamard_transform_cuda.cu:702-748), any dtype XLA can matmul (bf16/f16/f32).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

MAX_LOG2 = 15


@functools.lru_cache(maxsize=None)
def _hadamard_matrix_np(n: int) -> np.ndarray:
    """Sylvester-construction Hadamard matrix H_n (entries ±1), float32."""
    assert n & (n - 1) == 0 and n > 0
    h = np.array([[1.0]], np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def hadamard_matrix(n: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_hadamard_matrix_np(n), dtype)


def _split_factors(n: int) -> tuple[int, int]:
    """Factor n = a * b with a, b <= 256 and both powers of two."""
    lg = n.bit_length() - 1
    la = lg // 2
    return 1 << la, 1 << (lg - la)


@jax.jit
def _fwht(x: jax.Array, scale: jax.Array) -> jax.Array:
    n = x.shape[-1]
    dt = x.dtype
    if n <= 256:
        h = hadamard_matrix(n, dt)
        y = jnp.einsum("...k,kj->...j", x, h, preferred_element_type=jnp.float32)
    else:
        a, b = _split_factors(n)
        ha = hadamard_matrix(a, dt)
        hb = hadamard_matrix(b, dt)
        xg = x.reshape(*x.shape[:-1], a, b)
        y = jnp.einsum(
            "ia,...ab,bj->...ij", ha, xg, hb, preferred_element_type=jnp.float32
        )
        y = y.reshape(*x.shape[:-1], n)
    return (y * scale).astype(dt)


def hadamard_transform(x: jax.Array, scale: Optional[float] = None) -> jax.Array:
    """FWHT along the last axis; default scale 1/sqrt(n) makes it orthonormal
    (the reference's convention for HIGGS rotation)."""
    n = x.shape[-1]
    if n & (n - 1) or not (1 <= n.bit_length() - 1 <= MAX_LOG2):
        raise ValueError(
            f"FWHT size must be a power of two in [2, 2^{MAX_LOG2}], got {n}"
        )
    if scale is None:
        scale = 1.0 / math.sqrt(n)
    return _fwht(x, jnp.float32(scale))


def grouped_hadamard_transform(
    x: jax.Array, had_size: int, scale: Optional[float] = None
) -> jax.Array:
    """Apply the FWHT independently to contiguous groups of ``had_size``
    along the last axis (the blocked rotation HIGGS uses when the feature
    dim exceeds the rotation size)."""
    n = x.shape[-1]
    if n % had_size:
        raise ValueError(f"last dim {n} not a multiple of had_size {had_size}")
    xg = x.reshape(*x.shape[:-1], n // had_size, had_size)
    y = hadamard_transform(xg, scale)
    return y.reshape(x.shape)


def qgemm_hadamard(
    x: jax.Array,
    qweight,
    scales: jax.Array,
    table: jax.Array,
    num_bits: int,
    group_size: int,
    hadamard_size: int,
    **kw,
) -> jax.Array:
    """Fused pre-rotation + LUT-GEMM (role of flute.qgemm_hadamard,
    reference flute/__init__.py:32-50, qgemm.cpp:201-244): under jit the
    rotation einsum and the Pallas GEMM pipeline back-to-back."""
    from flute_tpu.ops import lut_gemm

    xr = grouped_hadamard_transform(x, hadamard_size)
    return lut_gemm.qgemm(xr, qweight, scales, table, num_bits, group_size, **kw)
