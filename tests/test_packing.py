"""Packed-layout round-trip tests (role of the reference's pack/unpack
contract, flute/utils.py:269-407)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu import packing
from flute_tpu import bitutils


@pytest.mark.parametrize("bits", [1, 2, 3, 4, 8])
def test_pack_unpack_roundtrip(bits):
    rng = np.random.default_rng(bits)
    k, n = 512, 256
    codes = rng.integers(0, 2 ** bits, size=(k, n), dtype=np.int32)
    planes = packing.pack(jnp.asarray(codes), bits)
    expected_shapes = packing.PackFormat(bits).packed_shapes(k, n)
    assert [tuple(p.shape) for p in planes] == expected_shapes
    assert all(p.dtype == jnp.int32 for p in planes)
    rec = np.asarray(packing.unpack(planes, bits))
    np.testing.assert_array_equal(rec, codes)


@pytest.mark.parametrize("bits", [2, 3, 4])
def test_pack_np_matches_jnp(bits):
    rng = np.random.default_rng(10 + bits)
    k, n = 256, 128
    codes = rng.integers(0, 2 ** bits, size=(k, n), dtype=np.int32)
    planes_j = packing.pack(jnp.asarray(codes), bits)
    planes_n = packing.pack_np(codes, bits)
    for pj, pn in zip(planes_j, planes_n):
        np.testing.assert_array_equal(np.asarray(pj), pn)


def test_pack_rejects_unaligned_k():
    codes = jnp.zeros((100, 128), dtype=jnp.int32)
    with pytest.raises(ValueError):
        packing.pack(codes, 4)


def test_plane_split_merge():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 8, size=(64, 32), dtype=np.int32))
    parts = bitutils.plane_split(codes, 3)
    assert len(parts) == 2
    merged = bitutils.plane_merge(parts, 3)
    np.testing.assert_array_equal(np.asarray(merged), np.asarray(codes))


def test_kernel_block_independence():
    """Any block_k that is a multiple of the pack chunk unpacks
    independently: unpacking rows [c*chunk : (c+1)*chunk] of the packed array
    must reproduce codes rows [c*chunk : (c+1)*chunk]."""
    rng = np.random.default_rng(7)
    k, n, bits = 1024, 128, 4
    codes = rng.integers(0, 16, size=(k, n), dtype=np.int32)
    (plane,) = packing.pack(jnp.asarray(codes), bits)
    rows_per_chunk = packing.DEFAULT_CHUNK * bits // 32
    for c in range(k // packing.DEFAULT_CHUNK):
        block = plane[c * rows_per_chunk:(c + 1) * rows_per_chunk]
        rec = np.asarray(packing.unpack([block], bits))
        np.testing.assert_array_equal(
            rec, codes[c * packing.DEFAULT_CHUNK:(c + 1) * packing.DEFAULT_CHUNK]
        )


def test_w3_wide_roundtrip_and_parity():
    """Wide 3-bit layout: np/jnp packers agree, unpack_np dispatches on the
    single-plane shape, and the kernel is identity bit-exact."""
    import jax.numpy as jnp

    from flute_tpu.ops import lut_gemm

    rng = np.random.default_rng(3)
    k, n, g = 512, 256, 64
    codes = rng.integers(0, 8, (k, n), dtype=np.int32)
    pnp = packing.pack_w3_wide_np(codes)
    pjnp = packing.pack_w3_wide_jnp(jnp.asarray(codes))
    np.testing.assert_array_equal(pnp[0], np.asarray(pjnp[0]))
    np.testing.assert_array_equal(packing.unpack_np(pnp, 3), codes)
    assert packing.is_w3_wide(pnp, 3, k)

    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // g, n)), jnp.bfloat16)
    table = jnp.asarray(np.sort(rng.standard_normal(8)), jnp.float32)
    y = lut_gemm.lut_qgemm(
        jnp.eye(k, dtype=jnp.bfloat16), [jnp.asarray(p) for p in pnp],
        scales, table, num_bits=3,
    )
    want = lut_gemm.dequantize_codes(jnp.asarray(codes), scales, table, jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(y, np.float32), np.asarray(want, np.float32)
    )


def test_w3_wide_quantize_linear_default():
    """3-bit quantize_linear defaults to the wide layout and matches the
    classic layout's dequantization exactly."""
    import jax.numpy as jnp

    from flute_tpu import nn as fnn

    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32)
    lw = fnn.quantize_linear(w, num_bits=3, group_size=64)
    lc = fnn.quantize_linear(w, num_bits=3, group_size=64, wide=False)
    assert len(lw.planes) == 1 and len(lc.planes) == 2
    np.testing.assert_array_equal(
        np.asarray(lw.dequantize(), np.float32),
        np.asarray(lc.dequantize(), np.float32),
    )
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(lw(x), np.float32), np.asarray(lc(x), np.float32)
    )


def test_w3_wide_f32_compute():
    """Wide 3-bit with float32 activations (explicit even/odd interleave
    path) is identity bit-exact."""
    import jax.numpy as jnp

    from flute_tpu.ops import lut_gemm

    rng = np.random.default_rng(5)
    k, n, g = 512, 256, 64
    codes = rng.integers(0, 8, (k, n), dtype=np.int32)
    planes = [jnp.asarray(p) for p in packing.pack_w3_wide_np(codes)]
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // g, n)), jnp.float32)
    table = jnp.asarray(np.sort(rng.standard_normal(8)), jnp.float32)
    y = lut_gemm.lut_qgemm(
        jnp.eye(k, dtype=jnp.float32), planes, scales, table, num_bits=3
    )
    want = lut_gemm.dequantize_codes(jnp.asarray(codes), scales, table, jnp.float32)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(want))
