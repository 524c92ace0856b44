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
