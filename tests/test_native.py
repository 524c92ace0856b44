"""Native fast-packer tests: the C++ path must agree bit-for-bit with the
numpy reference implementation in flute_tpu/packing.py."""

import numpy as np
import pytest

from flute_tpu import native, packing


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("no C++ toolchain / native lib unavailable")
    return True


@pytest.mark.parametrize("num_bits", [2, 3, 4])
@pytest.mark.parametrize("chunk", [128, 256])
def test_native_pack_matches_numpy(lib_available, num_bits, chunk):
    rng = np.random.default_rng(0)
    k, n = 1024, 384
    codes = rng.integers(0, 2**num_bits, (k, n), dtype=np.int32)
    got = packing.pack_np(codes, num_bits, chunk=chunk, use_native=True)
    want = packing.pack_np(codes, num_bits, chunk=chunk, use_native=False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@pytest.mark.parametrize("num_bits", [2, 3, 4])
def test_native_unpack_roundtrip(lib_available, num_bits):
    rng = np.random.default_rng(1)
    k, n = 512, 256
    codes = rng.integers(0, 2**num_bits, (k, n), dtype=np.int32)
    planes = packing.pack_np(codes, num_bits, use_native=True)
    back_native = packing.unpack_np(planes, num_bits, use_native=True)
    back_numpy = packing.unpack_np(planes, num_bits, use_native=False)
    np.testing.assert_array_equal(back_native, codes)
    np.testing.assert_array_equal(back_numpy, codes)


@pytest.mark.parametrize("chunk", [256, 512])
def test_native_w3_wide_matches_numpy(lib_available, chunk):
    rng = np.random.default_rng(3)
    k, n = 1024, 384
    codes = rng.integers(0, 8, (k, n), dtype=np.int32)
    (got,) = packing.pack_w3_wide_np(codes, chunk=chunk, use_native=True)
    (want,) = packing.pack_w3_wide_np(codes, chunk=chunk, use_native=False)
    np.testing.assert_array_equal(got, want)
    back_native = packing.unpack_w3_wide_np(got, chunk=chunk, use_native=True)
    back_numpy = packing.unpack_w3_wide_np(got, chunk=chunk, use_native=False)
    np.testing.assert_array_equal(back_native, codes)
    np.testing.assert_array_equal(back_numpy, codes)


@pytest.mark.slow
def test_native_throughput_sane(lib_available):
    """Native pack of a 4096x4096 4-bit matrix should beat numpy."""
    import time

    rng = np.random.default_rng(2)
    codes = rng.integers(0, 16, (4096, 4096), dtype=np.int32)
    t0 = time.perf_counter()
    packing.pack_np(codes, 4, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    packing.pack_np(codes, 4, use_native=False)
    t_numpy = time.perf_counter() - t0
    # don't enforce a hard ratio (CI variance); just sanity-bound native
    assert t_native < max(t_numpy * 2.0, 1.0), (t_native, t_numpy)
