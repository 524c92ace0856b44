"""Tests for NFL learned scales, HIGGS vector dequant, bitsandbytes import,
and the Hadamard transform (reference test tiers: tests/higgs.py:60-104
exact vector-dequant equality; learnable loss-decrease; bnb lossless)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flute_tpu import nn as fnn
from flute_tpu.models import llama
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.hadamard import (
    grouped_hadamard_transform,
    hadamard_matrix,
    hadamard_transform,
    qgemm_hadamard,
)
from flute_tpu.quantize import bitsandbytes as bnb
from flute_tpu.quantize import higgs, learnable, nf


# ---------------------------------------------------------------------------
# Hadamard
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [2, 16, 128, 512, 4096])
def test_hadamard_matches_dense_matmul(n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
    got = hadamard_transform(x)
    h = np.asarray(hadamard_matrix(n)) / np.sqrt(n)
    want = np.asarray(x) @ h
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def test_hadamard_orthonormal_involution():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 1024)), jnp.float32)
    y = hadamard_transform(hadamard_transform(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)


def test_grouped_hadamard():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    y = grouped_hadamard_transform(x, 128)
    for g in range(4):
        want = hadamard_transform(x[:, g * 128:(g + 1) * 128])
        np.testing.assert_allclose(
            np.asarray(y[:, g * 128:(g + 1) * 128]), np.asarray(want), atol=1e-4
        )


def test_qgemm_hadamard_fusion():
    rng = np.random.default_rng(3)
    k, n, b, g = 256, 256, 4, 64
    codes = rng.integers(0, 2**b, (k, n), dtype=np.int32)
    from flute_tpu import packing

    planes = packing.pack(codes, b)
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // g, n)), jnp.bfloat16)
    table = nf.nf_values(b)
    x = jnp.asarray(rng.standard_normal((3, k)), jnp.bfloat16)
    got = qgemm_hadamard(x, planes, scales, table, b, g, hadamard_size=128)
    xr = grouped_hadamard_transform(x, 128)
    want = lut_gemm.lut_qgemm(xr, planes, scales, table, num_bits=b)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


# ---------------------------------------------------------------------------
# HIGGS (vector dequantization via pair LUT)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_bits", [2, 4])
def test_higgs_vector_dequant_exact(num_bits):
    """Kernel vector dequantization must equal grid[codes] * scales exactly
    (reference tests/higgs.py:60-104 identity-reconstruct equality)."""
    rng = np.random.default_rng(4)
    k, n, g = 256, 256, 64
    e = 2**num_bits
    codes = rng.integers(0, e * e, (k // 2, n), dtype=np.int64)
    grid = rng.standard_normal((e * e, 2)).astype(np.float32)
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // g, n)), jnp.bfloat16)
    layer = higgs.from_higgs(
        codes, grid, scales, num_bits=num_bits, group_size=g
    )
    # independent oracle
    pv = np.asarray(layer.pair_values)
    deq_ref = np.empty((k, n), np.float32)
    sc = np.repeat(np.asarray(scales, np.float32), g, axis=0)
    ce = codes & (e - 1)
    co = codes >> num_bits
    v = pv[ce, co]  # [k/2, n, 2]
    deq_ref[0::2] = v[..., 0]
    deq_ref[1::2] = v[..., 1]
    bf = lambda a: np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)
    deq_ref = bf(bf(deq_ref) * bf(sc))

    deq_kernel = np.asarray(layer.dequantize(jnp.bfloat16), np.float32)
    np.testing.assert_array_equal(deq_kernel, deq_ref)


def test_higgs_scalar_degenerate():
    rng = np.random.default_rng(5)
    k, n, b, g = 256, 128, 4, 64
    codes = rng.integers(0, 2**b, (k, n), dtype=np.int32)
    grid = np.sort(rng.standard_normal(2**b)).astype(np.float32)
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // g, n)), jnp.bfloat16)
    layer = higgs.from_higgs_scalar(
        codes, grid, scales, num_bits=b, group_size=g
    )
    want = lut_gemm.dequantize_codes(
        jnp.asarray(codes), scales, jnp.asarray(grid), jnp.bfloat16
    )
    np.testing.assert_array_equal(
        np.asarray(layer.dequantize(), np.float32), np.asarray(want, np.float32)
    )


# ---------------------------------------------------------------------------
# bitsandbytes import
# ---------------------------------------------------------------------------


def _fake_bnb_layer(rng, n=128, k=256, blocksize=64, nested=True):
    numel = n * k
    codes = rng.integers(0, 16, numel, dtype=np.int32)
    packed = ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8)
    table = np.asarray(nf.QLORA_NF4)
    absmax_f = rng.uniform(0.1, 2.0, numel // blocksize).astype(np.float32)
    if not nested:
        state = bnb.BNBQuantState(
            code=table, absmax=absmax_f, blocksize=blocksize, shape=(n, k)
        )
        return packed, state
    # nested-quantize absmax the way bnb does (8-bit dynamic map per 256 blk)
    offset = float(absmax_f.mean())
    centered = absmax_f - offset
    nested_code = np.linspace(-1, 1, 256).astype(np.float32)
    nb = 256
    pad = (-len(centered)) % nb
    cpad = np.pad(centered, (0, pad)).reshape(-1, nb)
    nested_absmax = np.abs(cpad).max(axis=1)
    nested_absmax[nested_absmax == 0] = 1.0
    normalized = cpad / nested_absmax[:, None]
    aq = np.argmin(
        np.abs(normalized.reshape(-1, 1) - nested_code[None, :]), axis=1
    ).astype(np.uint8)[: len(centered)]
    state = bnb.BNBQuantState(
        code=table,
        absmax=aq,
        blocksize=blocksize,
        shape=(n, k),
        nested_code=nested_code,
        nested_absmax=nested_absmax,
        offset=offset,
    )
    return packed, state


@pytest.mark.parametrize("nested", [False, True])
def test_bnb_convert_matches_reference_dequant(nested):
    rng = np.random.default_rng(6)
    packed, state = _fake_bnb_layer(rng, nested=nested)
    layer = bnb.convert_bnb_linear4bit(packed, state, dtype=jnp.float32)
    want = bnb.dequantize_bnb(state, packed)  # [n, k]
    got = np.asarray(layer.dequantize(jnp.float32), np.float32).T
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# NFL learned scales
# ---------------------------------------------------------------------------


def test_learnable_fake_quant_matches_nf_quantize():
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)  # [in, out]
    layer = learnable.make_learnable(
        w, num_bits=4, group_size=64, symmetric=False
    )
    fq = layer.fake_quantized_weight(jnp.float32)
    want, _, _, _ = nf.nf_quantize(w.T, 4, 64)  # quantizes along last axis
    np.testing.assert_allclose(
        np.asarray(fq), np.asarray(want).T, rtol=1e-5, atol=1e-5
    )


def test_learnable_symmetric_default_finalizes_w4sym():
    """4-bit learnable layers default to the ascending sign-symmetric grid
    and finalize onto the w4sym fast layout with matching values."""
    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)  # [in, out]
    layer = learnable.make_learnable(w, num_bits=4, group_size=64)
    fq = layer.fake_quantized_weight(jnp.float32)
    want, _, _, _ = nf.nf_quantize_symmetric(w.T, 4, 64)
    np.testing.assert_allclose(
        np.asarray(fq), np.asarray(want).T, rtol=1e-5, atol=1e-5
    )
    q = learnable.finalize(layer)
    assert q.layout == "w4sym"
    # finalized dequant equals the learnable fake-quant (bf16-rounded)
    fq16 = layer.fake_quantized_weight(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(q.dequantize(jnp.bfloat16), np.float32),
        np.asarray(fq16, np.float32),
    )


def test_learn_scales_reduces_loss():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=8)
    rng = np.random.default_rng(8)
    batch = rng.integers(0, 100, (2, 16))
    batches = [batch] * 4  # same batch -> loss must decrease monotonically

    losses = []
    trained = learnable.learn_scales(
        params,
        config,
        batches,
        num_bits=3,
        group_size=64,
        learning_rate=3e-3,
        callback=lambda i, l: losses.append(l),
    )
    assert len(losses) == 4
    assert losses[-1] < losses[0], losses

    final = learnable.finalize_model(trained, chunk=128)
    for layer in final["layers"]:
        assert isinstance(layer["q"], fnn.QuantizedLinear)
        assert layer["q"].num_bits == 3


def test_scales_gradient_flows():
    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    layer = learnable.make_learnable(w, num_bits=4, group_size=64)
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)

    def loss(scales):
        l2 = dataclasses.replace(layer, scales=scales)
        return jnp.sum(l2(x) ** 2)

    g = jax.grad(loss)(layer.scales)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_bnb_fp4_table_normalized():
    """FP4's non-ascending sign-magnitude table is accepted: sorted +
    code-permuted at convert time, value-identical to bnb's dequant."""
    rng = np.random.default_rng(7)
    n, k, bs = 128, 256, 64
    # bnb FP4 table (sign-magnitude order, not ascending)
    fp4 = np.asarray(
        [0.0, 0.0052, 0.6667, 1.0, 0.3333, 0.5, 0.1667, 0.25,
         -0.0, -0.0052, -0.6667, -1.0, -0.3333, -0.5, -0.1667, -0.25],
        np.float32,
    )
    codes = rng.integers(0, 16, n * k, dtype=np.int32)
    packed = ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8)
    absmax = rng.uniform(0.5, 2.0, (n * k) // bs).astype(np.float32)
    state = bnb.BNBQuantState(
        code=fp4, absmax=absmax, blocksize=bs, shape=(n, k)
    )
    layer = bnb.convert_bnb_linear4bit(packed, state, dtype=jnp.float32)
    want = bnb.dequantize_bnb(state, packed)  # [N, K]
    got = np.asarray(layer.dequantize(jnp.float32), np.float32).T
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # table is now ascending (duplicates from +/-0 allowed)
    assert np.all(np.diff(np.asarray(layer.table)) >= 0)


def test_bnb_file_level_checkpoint(tmp_path):
    """Round-trip a synthetic HF-serialized bnb checkpoint (packed JSON
    quant_state tensor + nested absmax) through load_bnb_checkpoint."""
    import json as json_mod

    from safetensors.numpy import save_file

    rng = np.random.default_rng(8)
    n, k, bs = 128, 256, 64
    packed, state = _fake_bnb_layer(rng, n=n, k=k, blocksize=bs, nested=True)

    meta = {
        "quant_type": "nf4",
        "blocksize": bs,
        "shape": [n, k],
        "dtype": "bfloat16",
        "nested_blocksize": state.nested_blocksize,
        "nested_offset": float(state.offset),
    }
    meta_t = np.frombuffer(json_mod.dumps(meta).encode(), np.uint8).copy()
    prefix = "model.layers.0.self_attn.q_proj"
    tensors = {
        prefix + ".weight": np.asarray(packed, np.uint8).reshape(-1, 1),
        prefix + ".weight.absmax": np.asarray(state.absmax, np.uint8),
        prefix + ".weight.quant_map": np.asarray(state.code, np.float32),
        prefix + ".weight.nested_absmax": np.asarray(state.nested_absmax, np.float32),
        prefix + ".weight.nested_quant_map": np.asarray(state.nested_code, np.float32),
        prefix + ".weight.quant_state.bitsandbytes__nf4": meta_t,
        "model.norm.weight": rng.standard_normal(8).astype(np.float32),
    }
    save_file(tensors, str(tmp_path / "model.safetensors"))

    out = bnb.load_bnb_checkpoint(str(tmp_path))
    layer = out[prefix]
    want = bnb.dequantize_bnb(state, packed)
    got = np.asarray(layer.dequantize(jnp.bfloat16), np.float32).T
    want_bf = np.asarray(
        jnp.asarray(state.code, jnp.bfloat16)[
            jnp.asarray(bnb.unpack_nibbles(packed, n * k).reshape(n, k))
        ] * jnp.repeat(
            jnp.asarray(bnb.decode_absmax(state).reshape(n, -1), jnp.bfloat16),
            bs, axis=1,
        ),
        np.float32,
    )
    np.testing.assert_array_equal(got, want_bf)
    # f32 check against the independent reference decode (loose: bf16 round)
    assert np.abs(got - want).max() <= np.abs(want).max() * 1.2e-2
    assert "model.norm.weight" in out
