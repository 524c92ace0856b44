"""Kernel numerics sweep over the model-zoo GEMM shapes (role of the
reference's tests/kernel.py x tests/shapes.py sweep, SURVEY §4 tier 1).

The reference sweeps 33 shapes x bits x groups x dtypes x 10 seeds on GPU;
in CPU interpreter mode that is hours, so the default run checks a
representative sub-grid on reduced-K shapes and the full grid is available
via FLUTE_TPU_FULL_SWEEP=1 (intended for the real chip).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu import packing, shapes
from flute_tpu.ops import lut_gemm

FULL = os.environ.get("FLUTE_TPU_FULL_SWEEP", "0") == "1"

RTOL = {"bfloat16": 1.1e-2, "float32": 1e-5}


def _check_one(n, k, num_bits, group_size, dtype, m, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 2**num_bits, size=(k, n), dtype=np.int32)
    planes = packing.pack(codes, num_bits)
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // group_size, n)), dtype)
    table = jnp.asarray(np.sort(rng.standard_normal(2**num_bits)), jnp.float32)

    # identity oracle: bit-exact dequant round-trip
    eye = jnp.eye(k, dtype=dtype)
    got = lut_gemm.lut_qgemm(eye, planes, scales, table, num_bits=num_bits)
    want = lut_gemm.dequantize_codes(jnp.asarray(codes), scales, table, dtype)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )

    # random oracle: threshold
    x = jnp.asarray(rng.standard_normal((m, k)), dtype)
    got = lut_gemm.lut_qgemm(x, planes, scales, table, num_bits=num_bits)
    want = lut_gemm.lut_qgemm_reference(x, jnp.asarray(codes), scales, table)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    denom = max(float(jnp.abs(want).max()), 1e-6)
    assert err.max() / denom < RTOL[jnp.dtype(dtype).name]


if FULL:
    GRID = [
        (s.n, s.k, b, g, jnp.bfloat16, m, seed)
        for s in shapes.iter_shapes()
        for b in (2, 3, 4)
        for g in (64, 128, 256)
        for m in (1, 3, 32, 53, 64, 1024)
        for seed in range(3)
    ]
else:
    # CPU sub-grid: shrink K by 8 (layout repeats every 256 K rows) and
    # keep one shape per model family + the TP-sharded variants.
    GRID = []
    for s in shapes.iter_shapes(models=("llama3-8b", "gemma2-9b")):
        for b in (2, 3, 4):
            GRID.append((min(s.n, 512), min(s.k, 512), b, 64, jnp.bfloat16, 5, 0))
    GRID = list(dict.fromkeys(GRID))


@pytest.mark.parametrize("n,k,b,g,dtype,m,seed", GRID)
def test_kernel_shape_sweep(n, k, b, g, dtype, m, seed):
    _check_one(n, k, b, g, dtype, m, seed)
