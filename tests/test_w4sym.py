"""Sign-symmetric 4-bit ("w4sym") layout tests.

The w4sym path replaces the general W4 kernel's 2-gather+select chain with
three chainless 8-entry gathers (even/odd magnitudes + sign-XOR masks) for
tables satisfying ``table[c + 8] == -table[c]`` (see
flute_tpu/packing.py pack_w4_sym_np and docs/KERNEL_NOTES.md). Preserves
the reference's oracle structure (reference tests/kernel.py:30-36,105-107):
identity = bit-exact, random = threshold, plus pack round-trips and the
module-level fake-quant equivalence.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu import packing
from flute_tpu.nn import QuantizedLinear, quantize_linear
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.kernel_config import KernelConfig
from flute_tpu.quantize import nf

THRESHOLDS = {
    jnp.dtype(jnp.float16): 2.0e-3,
    jnp.dtype(jnp.bfloat16): 1.1e-2,
    jnp.dtype(jnp.float32): 1e-5,
}


def sym_table(seed=0):
    rng = np.random.default_rng(seed)
    mags = np.sort(np.abs(rng.standard_normal(8))).astype(np.float32)
    return np.concatenate([mags, -mags])


def make_case(m, n, k, group_size, dtype, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 16, size=(k, n), dtype=np.int32)
    planes = [jnp.asarray(p) for p in packing.pack_w4_sym_np(codes)]
    scales = jnp.asarray(
        rng.uniform(0.5, 1.5, (k // group_size, n)).astype(np.float32), dtype
    )
    table = jnp.asarray(sym_table(seed), jnp.float32)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=dtype)
    return x, jnp.asarray(codes), planes, scales, table


def rel_err(y, y_ref):
    y = np.asarray(y, dtype=np.float64)
    y_ref = np.asarray(y_ref, dtype=np.float64)
    denom = np.linalg.norm(y_ref)
    if denom == 0:
        return np.linalg.norm(y - y_ref)
    return np.linalg.norm(y - y_ref) / denom


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(512, 128), dtype=np.int32)
    plane = packing.pack_w4_sym_np(codes)[0]
    assert plane.shape == (512 // 8, 128)
    back = packing.unpack_w4_sym_np(plane)
    np.testing.assert_array_equal(back, codes)
    # numpy and native packers agree (native used automatically if built)
    plane_np = packing.pack_w4_sym_np(codes, use_native=False)[0]
    np.testing.assert_array_equal(plane, plane_np)


def test_pack_jnp_matches_np():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 16, size=(512, 128), dtype=np.int32)
    p_np = packing.pack_w4_sym_np(codes, use_native=False)[0]
    p_j = np.asarray(packing.pack_w4_sym_jnp(jnp.asarray(codes))[0])
    np.testing.assert_array_equal(p_j, p_np)


def test_is_symmetric_table():
    assert packing.is_symmetric_table(sym_table(), 4)
    t = sym_table()
    t[12] += 1e-3
    assert not packing.is_symmetric_table(t, 4)
    # asymmetric QLoRA NF4 is not symmetric
    assert not packing.is_symmetric_table(np.asarray(nf.QLORA_NF4), 4)
    # the exact symmetric NF table in sym order IS
    ts, _ = packing.sym_code_order(nf.nf_values_symmetric_exact(4))
    assert packing.is_symmetric_table(ts, 4)


def test_sym_code_order():
    v = nf.nf_values_symmetric_exact(4)
    ts, perm = packing.sym_code_order(v)
    # perm maps ascending codes to sym codes preserving values
    np.testing.assert_array_equal(ts[perm], v)
    # sym contract
    np.testing.assert_array_equal(ts[8:], -ts[:8])


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16, jnp.float32])
def test_identity_bit_exact(dtype):
    n, k, g = 256, 512, 64
    _, codes, planes, scales, table = make_case(1, n, k, g, dtype, 0)
    eye = jnp.eye(k, dtype=dtype)
    got = lut_gemm.lut_qgemm(
        eye, planes, scales, table, num_bits=4, layout="w4sym"
    )
    want = lut_gemm.dequantize_codes(codes, scales, table, dtype)
    assert np.array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16, jnp.float32])
@pytest.mark.parametrize("m", [1, 7, 32])
def test_random_threshold(dtype, m):
    n, k, g = 256, 512, 64
    x, codes, planes, scales, table = make_case(m, n, k, g, dtype, 1)
    got = lut_gemm.lut_qgemm(
        x, planes, scales, table, num_bits=4, layout="w4sym"
    )
    want = lut_gemm.lut_qgemm_reference(x, codes, scales, table)
    assert rel_err(got, want) < THRESHOLDS[jnp.dtype(dtype)]


def test_negative_magnitudes_table():
    """The contract is table[c+8] == -table[c]; magnitudes may be of either
    sign (XOR flips, never forces)."""
    n, k, g = 128, 256, 64
    rng = np.random.default_rng(3)
    mags = rng.standard_normal(8).astype(np.float32)  # mixed signs
    table = jnp.asarray(np.concatenate([mags, -mags]))
    codes = rng.integers(0, 16, size=(k, n), dtype=np.int32)
    planes = [jnp.asarray(p) for p in packing.pack_w4_sym_np(codes)]
    scales = jnp.asarray(np.ones((k // g, n), np.float32), jnp.bfloat16)
    eye = jnp.eye(k, dtype=jnp.bfloat16)
    got = lut_gemm.lut_qgemm(
        eye, planes, scales, table, num_bits=4, layout="w4sym"
    )
    want = lut_gemm.dequantize_codes(
        jnp.asarray(codes), scales, table, jnp.bfloat16
    )
    assert np.array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


@pytest.mark.parametrize("bk", [256, 512])
def test_explicit_config(bk):
    n, k, g = 256, 512, 64
    x, codes, planes, scales, table = make_case(8, n, k, g, jnp.bfloat16, 2)
    cfg = KernelConfig(block_m=16, block_n=128, block_k=bk)
    got = lut_gemm.lut_qgemm(
        x, planes, scales, table, num_bits=4, layout="w4sym", config=cfg
    )
    want = lut_gemm.lut_qgemm_reference(x, codes, scales, table)
    assert rel_err(got, want) < THRESHOLDS[jnp.dtype(jnp.bfloat16)]


def test_unpack_via_kernel():
    n, k = 128, 512
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 16, size=(k, n), dtype=np.int32)
    planes = [jnp.asarray(p) for p in packing.pack_w4_sym_np(codes)]
    back = packing.unpack_via_kernel(planes, 4, n, k, layout="w4sym")
    np.testing.assert_array_equal(np.asarray(back), codes)


def test_quantize_linear_symmetric_default():
    """4-bit quantize_linear defaults to the symmetric NF grid + w4sym
    layout, and the layer forward matches its own dequantized dense
    forward within the bf16 threshold."""
    rng = np.random.default_rng(5)
    w = rng.standard_normal((256, 512)).astype(np.float32)
    layer = quantize_linear(w, num_bits=4, group_size=64)
    assert layer.layout == "w4sym"
    assert packing.is_symmetric_table(np.asarray(layer.table), 4)
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.bfloat16)
    y = layer(x)
    dense = layer.dequantize(jnp.bfloat16)
    want = x @ dense
    assert rel_err(y, want) < THRESHOLDS[jnp.dtype(jnp.bfloat16)]


def test_quantize_linear_fake_equivalence():
    """Kernel forward == fake-quant (symmetric) dense forward — identity
    input, bit-exact (reference tests/vllm.py:57-67 oracle)."""
    rng = np.random.default_rng(6)
    w = rng.standard_normal((128, 256)).astype(np.float32)
    layer = quantize_linear(w, num_bits=4, group_size=64)
    w_fake = nf.nf_quantize_fake(
        jnp.asarray(w), 4, 64, jnp.bfloat16, symmetric=True
    )
    eye = jnp.eye(256, dtype=jnp.bfloat16)
    got = layer(eye)
    assert np.array_equal(
        np.asarray(got, np.float32), np.asarray(w_fake.T, np.float32)
    )


def test_quantize_linear_asymmetric_optout():
    rng = np.random.default_rng(7)
    w = rng.standard_normal((128, 256)).astype(np.float32)
    layer = quantize_linear(w, num_bits=4, group_size=64, symmetric=False)
    assert layer.layout == "auto"
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.bfloat16)
    y = layer(x)
    want = x @ layer.dequantize(jnp.bfloat16)
    assert rel_err(y, want) < THRESHOLDS[jnp.dtype(jnp.bfloat16)]


def test_supplied_symmetric_table_detected():
    rng = np.random.default_rng(8)
    w = rng.standard_normal((128, 256)).astype(np.float32)
    layer = quantize_linear(
        w, num_bits=4, group_size=64, table=jnp.asarray(sym_table(8))
    )
    assert layer.layout == "w4sym"
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.bfloat16)
    y = layer(x)
    want = x @ layer.dequantize(jnp.bfloat16)
    assert rel_err(y, want) < THRESHOLDS[jnp.dtype(jnp.bfloat16)]


def test_layout_shape_validation():
    x, codes, planes, scales, table = make_case(2, 128, 256, 64, jnp.bfloat16, 9)
    with pytest.raises(ValueError):
        lut_gemm.lut_qgemm(
            x, planes, scales, table, num_bits=3, layout="w4sym"
        )
    bad = [planes[0][: planes[0].shape[0] // 2]]
    with pytest.raises(ValueError):
        lut_gemm.lut_qgemm(x, bad, scales, table, num_bits=4, layout="w4sym")
