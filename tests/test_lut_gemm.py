"""Kernel numerics tests (role of reference tests/kernel.py).

Preserves the reference's two oracle modes (tests/kernel.py:30-36,105-107):
  * identity mode — x = I requires bit-exact dequantization round-trip;
  * random mode   — relative error under dtype thresholds.
Runs in Pallas interpreter mode on CPU (a correctness capability the CUDA
reference does not have); the same tests run on hardware with
FLUTE_TPU_TEST_PLATFORM=tpu.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu import packing
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.kernel_config import KernelConfig
from flute_tpu.quantize import nf

# Reference thresholds (tests/kernel.py:12-13); f32 is ours (TPU-native).
THRESHOLDS = {
    jnp.dtype(jnp.float16): 2.0e-3,
    jnp.dtype(jnp.bfloat16): 1.1e-2,
    jnp.dtype(jnp.float32): 1e-5,
}


def make_case(m, n, k, bits, group_size, dtype, seed, uniform_table=False):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, k)).astype(np.float32)
    if uniform_table:
        table = jnp.arange(2 ** bits, dtype=jnp.float32) - (2 ** (bits - 1))
        _, codes_nk, scales_nk = nf.quantize_with_table(
            jnp.asarray(w), jnp.sort(table), group_size
        )
        table = jnp.sort(table)
    else:
        _, codes_nk, scales_nk, table = nf.nf_quantize(jnp.asarray(w), bits, group_size)
    codes = jnp.asarray(codes_nk).T  # [K, N]
    scales = jnp.asarray(scales_nk).T  # [K//g, N]
    planes = packing.pack(codes, bits)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=dtype)
    return x, codes, planes, scales.astype(dtype), table


def rel_err(y, y_ref):
    y = np.asarray(y, dtype=np.float64)
    y_ref = np.asarray(y_ref, dtype=np.float64)
    denom = np.linalg.norm(y_ref)
    if denom == 0:
        return np.linalg.norm(y - y_ref)
    return np.linalg.norm(y - y_ref) / denom


@pytest.mark.parametrize("bits", [2, 3, 4])
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16, jnp.float32])
def test_identity_bit_exact(bits, dtype):
    """x = I must reproduce the dequantized weight bit-exactly."""
    n, k, g = 256, 512, 64
    _, codes, planes, scales, table = make_case(1, n, k, bits, g, dtype, seed=bits)
    eye = jnp.eye(k, dtype=dtype)
    y = lut_gemm.lut_qgemm(eye, planes, scales, table, num_bits=bits)
    expected = lut_gemm.dequantize_codes(codes, scales, table, dtype)
    np.testing.assert_array_equal(
        np.asarray(y, dtype=np.float32), np.asarray(expected, dtype=np.float32)
    )


@pytest.mark.parametrize("bits", [2, 3, 4])
@pytest.mark.parametrize("group_size", [32, 64, 128, 256])
@pytest.mark.parametrize("m", [1, 3, 16, 64])
def test_random_threshold(bits, group_size, m):
    dtype = jnp.bfloat16
    n, k = 256, 512
    x, codes, planes, scales, table = make_case(
        m, n, k, bits, group_size, dtype, seed=bits * 100 + group_size + m
    )
    y = lut_qgemm_checked(x, planes, scales, table, bits)
    y_ref = lut_gemm.lut_qgemm_reference(x, codes, scales, table)
    assert rel_err(y, y_ref) < THRESHOLDS[jnp.dtype(dtype)]


def lut_qgemm_checked(x, planes, scales, table, bits):
    return lut_gemm.lut_qgemm(x, planes, scales, table, num_bits=bits)


@pytest.mark.parametrize("bits", [2, 3, 4])
@pytest.mark.parametrize("m", [1, 16])
def test_random_threshold_fp16(bits, m):
    """float16 path at the reference's tighter 2e-3 threshold
    (reference treats fp16 as the primary dtype, README.md:233)."""
    dtype = jnp.float16
    group_size = 64
    n, k = 256, 512
    x, codes, planes, scales, table = make_case(
        m, n, k, bits, group_size, dtype, seed=bits * 100 + group_size + m
    )
    y = lut_gemm.lut_qgemm(x, planes, scales, table, num_bits=bits)
    y_ref = lut_gemm.lut_qgemm_reference(x, codes, scales, table)
    assert rel_err(y, y_ref) < THRESHOLDS[jnp.dtype(dtype)]


@pytest.mark.parametrize(
    "config",
    [
        KernelConfig(block_m=16, block_n=128, block_k=256),
        KernelConfig(block_m=32, block_n=256, block_k=512),
        KernelConfig(block_m=16, block_n=128, block_k=256, lut_mode="select"),
    ],
)
def test_config_variants(config):
    bits, g, m, n, k = 4, 64, 8, 256, 512
    dtype = jnp.bfloat16
    x, codes, planes, scales, table = make_case(m, n, k, bits, g, dtype, seed=42)
    y = lut_gemm.lut_qgemm(x, planes, scales, table, num_bits=bits, config=config)
    y_ref = lut_gemm.lut_qgemm_reference(x, codes, scales, table)
    assert rel_err(y, y_ref) < THRESHOLDS[jnp.dtype(dtype)]


def test_batch_dims_flatten():
    """Leading batch dims are flattened into M (reference qgemm.cpp:107-118)."""
    bits, g, n, k = 4, 64, 256, 512
    dtype = jnp.bfloat16
    x, codes, planes, scales, table = make_case(6, n, k, bits, g, dtype, seed=5)
    x3 = x.reshape(2, 3, k)
    y3 = lut_gemm.lut_qgemm(x3, planes, scales, table, num_bits=bits)
    assert y3.shape == (2, 3, n)
    y2 = lut_gemm.lut_qgemm(x, planes, scales, table, num_bits=bits)
    np.testing.assert_array_equal(
        np.asarray(y3.reshape(6, n), dtype=np.float32),
        np.asarray(y2, dtype=np.float32),
    )


def test_uniform_table():
    """Integer (uniform) tables work through the same LUT path."""
    bits, g, m, n, k = 4, 64, 4, 256, 512
    dtype = jnp.bfloat16
    x, codes, planes, scales, table = make_case(
        m, n, k, bits, g, dtype, seed=9, uniform_table=True
    )
    y = lut_gemm.lut_qgemm(x, planes, scales, table, num_bits=bits)
    y_ref = lut_gemm.lut_qgemm_reference(x, codes, scales, table)
    assert rel_err(y, y_ref) < THRESHOLDS[jnp.dtype(dtype)]


def test_reconstruct_matches_dequant():
    bits, g, n, k = 4, 64, 256, 512
    _, codes, planes, scales, table = make_case(1, n, k, bits, g, jnp.float32, seed=3)
    rec = packing.reconstruct(planes, scales, table, bits)
    expected = lut_gemm.dequantize_codes(codes, scales, table, jnp.float32)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(expected))


def test_unpack_via_kernel_recovers_codes():
    """Kernel-as-its-own-inverse (reference flute/utils.py:379-407)."""
    bits, g, n, k = 4, 64, 256, 512
    _, codes, planes, scales, table = make_case(1, n, k, bits, g, jnp.float32, seed=11)
    rec = packing.unpack_via_kernel(planes, bits, n=n, k=k)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(codes))


@pytest.mark.slow
def test_accum_modes():
    """Accumulation-policy ablation (reference AccumulationModeEnum
    {Low, High}, config.hpp:111): low-precision accumulation stays within
    the loose threshold but is measurably worse than f32; the config key
    round-trips the mode."""
    bits, g, m, n, k = 4, 64, 8, 256, 1024
    dtype = jnp.bfloat16
    x, codes, planes, scales, table = make_case(m, n, k, bits, g, dtype, seed=9)
    y_ref = lut_gemm.lut_qgemm_reference(x, codes, scales, table)

    cfg_hi = KernelConfig(block_m=16, block_n=128, block_k=256)
    cfg_lo = KernelConfig(block_m=16, block_n=128, block_k=256, accum="low")
    assert KernelConfig.from_key(cfg_lo.key()) == cfg_lo
    assert KernelConfig.from_key(cfg_hi.key()) == cfg_hi
    assert "_a" not in cfg_hi.key()  # legacy keys stay valid

    y_hi = lut_gemm.lut_qgemm(x, planes, scales, table, num_bits=bits, config=cfg_hi)
    y_lo = lut_gemm.lut_qgemm(x, planes, scales, table, num_bits=bits, config=cfg_lo)
    e_hi, e_lo = rel_err(y_hi, y_ref), rel_err(y_lo, y_ref)
    assert e_hi < THRESHOLDS[jnp.dtype(dtype)]
    assert e_lo < 5e-2  # degraded but bounded
    assert e_lo >= e_hi  # low mode never beats f32 accumulation


def test_f16_mosaic_fallback_routes_to_f32(monkeypatch):
    """On TPU generations whose Mosaic dialect has no f16 vectors
    (DeviceProfile.mosaic_f16=False, e.g. v5e), the compiled float16 path
    must compute in f32 and round once: the 2d kernel entry sees f32
    operands while the caller gets f16 back."""
    bits, g, m, n, k = 4, 64, 3, 256, 512
    x, codes, planes, scales, table = make_case(
        m, n, k, bits, g, jnp.float16, seed=11
    )
    seen = {}

    def fake_2d(x2, planes2, scales2, table2, pv, **kw):
        seen["x_dtype"] = x2.dtype
        seen["scales_dtype"] = scales2.dtype
        return jnp.zeros((x2.shape[0], scales2.shape[1]), x2.dtype)

    monkeypatch.setattr(lut_gemm, "_interpret_default", lambda: False)
    lut_gemm._mosaic_f16_ok.cache_clear()
    monkeypatch.setenv("FLUTE_TPU_F16_NATIVE", "0")
    monkeypatch.setattr(lut_gemm, "_lut_qgemm_2d", fake_2d)
    try:
        y = lut_gemm.lut_qgemm(x, planes, scales, table, num_bits=bits)
    finally:
        lut_gemm._mosaic_f16_ok.cache_clear()
    assert y.dtype == jnp.dtype(jnp.float16)
    assert seen["x_dtype"] == jnp.dtype(jnp.float32)
    assert seen["scales_dtype"] == jnp.dtype(jnp.float32)
