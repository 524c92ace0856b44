"""NF quantization semantics tests (oracle tier, see SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu.quantize import nf


def test_nf4_table_matches_qlora():
    v = np.asarray(nf.nf_values(4))
    assert v.shape == (16,)
    np.testing.assert_array_equal(v, nf.QLORA_NF4)


@pytest.mark.parametrize("bits", [2, 3, 4])
def test_nf_table_properties(bits):
    v = np.asarray(nf.nf_values(bits))
    assert v.shape == (2 ** bits,)
    assert np.all(np.diff(v) > 0), "table must be strictly ascending"
    assert v[0] == -1.0
    assert v[-1] == 1.0
    assert np.max(np.abs(v)) == 1.0
    # asymmetric tables contain exact zero
    assert 0.0 in v


@pytest.mark.parametrize("bits", [2, 3, 4])
@pytest.mark.parametrize("group_size", [32, 64, 128, 256])
def test_nf_quantize_roundtrip(bits, group_size):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 512)).astype(np.float32)
    deq, codes, scales, table = nf.nf_quantize(jnp.asarray(w), bits, group_size)
    codes = np.asarray(codes)
    assert codes.min() >= 0 and codes.max() < 2 ** bits
    assert scales.shape == (8, 512 // group_size)
    # codes must be the *nearest* table entry after normalization
    s = np.repeat(np.asarray(scales), group_size, axis=-1)
    normalized = w / s
    tbl = np.asarray(table)
    nearest = np.abs(normalized[..., None] - tbl[None, None, :]).argmin(-1)
    np.testing.assert_array_equal(codes, nearest)
    # dequantized == table[codes] * scales
    np.testing.assert_allclose(np.asarray(deq), tbl[codes] * s, rtol=1e-6)


def test_nf_quantize_searchsorted_matches_torch_semantics():
    """torch.searchsorted(pivots, x) (left) == jnp.searchsorted side='left'."""
    import torch

    rng = np.random.default_rng(1)
    x = rng.uniform(-1.2, 1.2, size=(64,)).astype(np.float32)
    v = np.asarray(nf.nf_values(4))
    pivots = np.asarray(nf.nf_pivots(jnp.asarray(v)))
    ours = np.asarray(jnp.searchsorted(jnp.asarray(pivots), jnp.asarray(x), side="left"))
    theirs = torch.searchsorted(torch.from_numpy(pivots), torch.from_numpy(x)).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_custom_scales():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((4, 256)).astype(np.float32)
    custom = np.full((4, 4), 2.5, dtype=np.float32)
    deq, codes, scales, table = nf.nf_quantize(
        jnp.asarray(w), 4, 64, custom_scales=jnp.asarray(custom)
    )
    np.testing.assert_array_equal(np.asarray(scales), custom)


def test_fake_quant_dtype_rounding():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((2, 128)).astype(np.float32)
    fake = nf.nf_quantize_fake(jnp.asarray(w), 4, 64, jnp.bfloat16)
    assert fake.dtype == jnp.bfloat16
    # must equal bf16(table)[codes] * bf16(scales), elementwise in bf16
    _, codes, scales, table = nf.nf_quantize(jnp.asarray(w), 4, 64)
    t = table.astype(jnp.bfloat16)
    s = jnp.repeat(scales.astype(jnp.bfloat16), 64, axis=-1)
    expected = (t[codes] * s).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(fake, dtype=np.float32), np.asarray(expected, dtype=np.float32)
    )
