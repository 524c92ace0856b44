"""HIGGS vector-quantization import — pair-LUT as the 2-D grid.

Role-equivalent of the reference's ``flute/integrations/higgs.py``
(higgs.py:8-126): HIGGS quantizes Hadamard-rotated weights in vectors of
size <= 2 against a grid of 2^(2b) 2-D points. The reference's insight —
reused here — is that a *pair lookup table* indexed by two b-bit sub-codes
IS vector dequantization: the grid plugs straight into the kernel's
``pair_values`` table (our ``lut_mode='pair_lut'``; reference qmap2,
flute/utils.py make_qmap2_from_qmap).

Code split convention: a HIGGS vector code ``c`` in [0, 2^(2b)) splits into
``ce = c & (2^b - 1)`` (even K row) and ``co = c >> b`` (odd K row); the
kernel recombines ``pc = ce | co << b == c`` and gathers ``grid[c]``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from flute_tpu.nn import QuantizedLinear, from_codes
from flute_tpu.ops.kernel_config import KernelConfig


def grid_to_pair_values(grid: np.ndarray, num_bits: int) -> jnp.ndarray:
    """[2^(2b), 2] grid -> [2^b, 2^b, 2] pair_values with [ce, co] indexing."""
    e = 2**num_bits
    g = np.asarray(grid, np.float32)
    if g.shape != (e * e, 2):
        raise ValueError(f"grid must be [{e * e}, 2], got {g.shape}")
    return jnp.asarray(g.reshape(e, e, 2).swapaxes(0, 1))


def from_higgs(
    codes: np.ndarray,  # [K/2, N] vector codes in [0, 2^(2b))  (vector_size=2)
    grid: np.ndarray,  # [2^(2b), 2] dequantized vector values
    scales: jnp.ndarray,  # [K // group_size, N]
    *,
    num_bits: int,
    group_size: int,
    hadamard_size: Optional[int] = None,
    bias: Optional[jnp.ndarray] = None,
    config: Optional[KernelConfig] = None,
    chunk: int = 256,
) -> QuantizedLinear:
    """Build a pair-LUT QuantizedLinear from HIGGS vector codes
    (reference prepare_data, higgs.py:8-97)."""
    codes = np.asarray(codes, np.int64)
    kp, n = codes.shape
    e = 2**num_bits
    if codes.min() < 0 or codes.max() >= e * e:
        raise ValueError("HIGGS codes out of range for num_bits")
    ce = codes & (e - 1)
    co = codes >> num_bits
    codes_kn = np.empty((2 * kp, n), np.int32)
    codes_kn[0::2] = ce
    codes_kn[1::2] = co
    pv = grid_to_pair_values(grid, num_bits)
    layer = from_codes(
        codes_kn,
        jnp.asarray(scales),
        table=None,
        num_bits=num_bits,
        group_size=group_size,
        pair_values=pv,
        bias=bias,
        config=config,
        chunk=chunk,
    )
    if layer.config is not None and layer.config.lut_mode != "pair_lut":
        import dataclasses as _dc

        layer = layer.with_config(
            _dc.replace(layer.config, lut_mode="pair_lut")
        )
    if hadamard_size is not None:
        import dataclasses as _dc

        layer = _dc.replace(layer, hadamard_size=hadamard_size)
    return layer


def from_higgs_scalar(
    codes: np.ndarray,  # [K, N] scalar codes (vector_size=1)
    grid: np.ndarray,  # [2^b, 1] or [2^b]
    scales: jnp.ndarray,
    *,
    num_bits: int,
    group_size: int,
    **kw,
) -> QuantizedLinear:
    """vector_size=1 degenerates to an ordinary scalar table
    (reference higgs.py vector_size==1 branch)."""
    table = np.asarray(grid, np.float32).reshape(-1)
    if table.shape[0] != 2**num_bits:
        raise ValueError("grid size mismatch")
    return from_codes(
        np.asarray(codes, np.int32),
        jnp.asarray(scales),
        table=jnp.asarray(table),
        num_bits=num_bits,
        group_size=group_size,
        **kw,
    )
