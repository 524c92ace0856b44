"""API invariant checks (role of reference fake ops, flute/ops.py:4-55)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu import packing
from flute_tpu.ops import lut_gemm


def _case(k=256, n=256, bits=4, g=64):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2**bits, (k, n), dtype=np.int32)
    planes = packing.pack(codes, bits)
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // g, n)), jnp.bfloat16)
    table = jnp.asarray(np.sort(rng.standard_normal(2**bits)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, k)), jnp.bfloat16)
    return x, planes, scales, table


@pytest.mark.slow
def test_wrong_plane_count_rejected():
    x, planes, scales, table = _case(bits=4)
    with pytest.raises(ValueError, match="plane"):
        lut_gemm.lut_qgemm(x, planes + planes, scales, table, num_bits=4)


def test_wrong_plane_shape_rejected():
    x, planes, scales, table = _case(bits=4)
    bad = [planes[0][: planes[0].shape[0] // 2]]
    with pytest.raises(ValueError, match="packed plane shape"):
        lut_gemm.lut_qgemm(x, bad, scales, table, num_bits=4)


def test_wrong_table_size_rejected():
    x, planes, scales, table = _case(bits=4)
    with pytest.raises(ValueError, match="table"):
        lut_gemm.lut_qgemm(x, planes, scales, table[:8], num_bits=4)


def test_bad_scale_groups_rejected():
    x, planes, scales, table = _case()
    with pytest.raises(ValueError, match="scale groups|inconsistent"):
        lut_gemm.lut_qgemm(x, planes, scales[:3], table, num_bits=4)


def test_qgemm_group_size_mismatch_rejected():
    x, planes, scales, table = _case(g=64)
    with pytest.raises(ValueError, match="inconsistent"):
        lut_gemm.qgemm(x, planes, scales, table, 4, 128)
