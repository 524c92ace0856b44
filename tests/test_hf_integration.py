"""End-to-end HF checkpoint pipeline: synthetic safetensors checkpoint ->
quantize_hf_model -> load_quantized_model -> generation (role of the
reference's HF from_pretrained flow, SURVEY §3.4)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

safetensors = pytest.importorskip("safetensors")
from safetensors.numpy import save_file

from flute_tpu.integrations import huggingface as hf
from flute_tpu.models import gemma2, llama
from flute_tpu.serving import Engine


def _write_llama_ckpt(path, config: llama.LlamaConfig, params):
    os.makedirs(path, exist_ok=True)
    hf_cfg = {
        "model_type": "llama",
        "vocab_size": config.vocab_size,
        "hidden_size": config.hidden_size,
        "intermediate_size": config.intermediate_size,
        "num_hidden_layers": config.num_layers,
        "num_attention_heads": config.num_heads,
        "num_key_value_heads": config.num_kv_heads,
        "head_dim": config.head_dim,
        "rms_norm_eps": config.rms_norm_eps,
        "rope_theta": config.rope_theta,
        "rope_scaling": None,
        "tie_word_embeddings": False,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f)
    # NOTE: safetensors serializes the raw buffer; transposed views must be
    # made contiguous or the file silently holds the untransposed data.
    tensors = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_norm"], np.float32),
        "lm_head.weight": np.ascontiguousarray(
            np.asarray(params["lm_head"], np.float32).T
        ),
    }
    names = {
        "q": "self_attn.q_proj", "k": "self_attn.k_proj",
        "v": "self_attn.v_proj", "o": "self_attn.o_proj",
        "gate": "mlp.gate_proj", "up": "mlp.up_proj", "down": "mlp.down_proj",
    }
    for li, layer in enumerate(params["layers"]):
        p = f"model.layers.{li}."
        tensors[p + "input_layernorm.weight"] = np.asarray(layer["attn_norm"], np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.asarray(layer["mlp_norm"], np.float32)
        for key, hf_name in names.items():
            tensors[p + hf_name + ".weight"] = np.ascontiguousarray(
                np.asarray(layer[key], np.float32).T
            )
    save_file(tensors, os.path.join(path, "model.safetensors"))


@pytest.mark.slow
def test_llama_hf_roundtrip(tmp_path):
    config = llama.LlamaConfig.tiny()
    # rope scaling off to match the serialized config
    import dataclasses

    config = dataclasses.replace(config, rope_scaling_factor=None)
    params = llama.init_params(config, rng=0)
    src = str(tmp_path / "hf")
    out = str(tmp_path / "quant")
    _write_llama_ckpt(src, config, params)

    cfg2 = hf.config_from_hf(src)
    assert cfg2.hidden_size == config.hidden_size
    assert cfg2.rope_scaling_factor is None

    loaded = hf.load_hf_params(src, cfg2, dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(loaded["layers"][0]["q"], np.float32),
        np.asarray(params["layers"][0]["q"], np.float32),
        rtol=1e-2, atol=1e-2,
    )

    hf.quantize_hf_model(src, out, num_bits=4, group_size=64)
    qparams, qconfig, sidecar = hf.load_quantized_model(out)
    assert sidecar["num_bits"] == 4
    assert qconfig.hidden_size == config.hidden_size

    eng = Engine(params=qparams, config=qconfig, max_len=16, batch_size=1)
    toks = eng.generate([[1, 2, 3]], max_new_tokens=3)
    assert len(toks[0]) == 3

    # quantized-from-checkpoint must match quantize_model on the same params
    direct = llama.quantize_model(
        llama.init_params(config, rng=0), 4, 64
    )
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    c1 = llama.init_cache(qconfig, 1, 8)
    c2 = llama.init_cache(config, 1, 8)
    l1, _ = llama.forward(qparams, qconfig, tokens, c1, jnp.int32(0))
    l2, _ = llama.forward(direct, config, tokens, c2, jnp.int32(0))
    denom = max(np.abs(np.asarray(l2)).max(), 1e-6)
    assert np.abs(np.asarray(l1) - np.asarray(l2)).max() / denom < 2e-2


def test_gemma2_config_and_mapping(tmp_path):
    path = str(tmp_path / "g2")
    os.makedirs(path)
    cfg = {
        "model_type": "gemma2",
        "vocab_size": 512,
        "hidden_size": 256,
        "intermediate_size": 512,
        "num_hidden_layers": 1,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 128,
        "rms_norm_eps": 1e-6,
        "query_pre_attn_scalar": 128,
        "attn_logit_softcapping": 50.0,
        "final_logit_softcapping": 30.0,
        "sliding_window": 8,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    c = hf.config_from_hf(path)
    assert isinstance(c, gemma2.Gemma2Config)
    assert c.query_pre_attn_scalar == 128.0 and c.sliding_window == 8

    rng = np.random.default_rng(0)
    tensors = {
        "model.embed_tokens.weight": rng.standard_normal((512, 256)).astype(np.float32),
        "model.norm.weight": np.zeros((256,), np.float32),
    }
    p = "model.layers.0."
    for nm, shape in [
        ("input_layernorm.weight", (256,)),
        ("post_attention_layernorm.weight", (256,)),
        ("pre_feedforward_layernorm.weight", (256,)),
        ("post_feedforward_layernorm.weight", (256,)),
    ]:
        tensors[p + nm] = np.zeros(shape, np.float32)
    for nm, shape in [
        ("self_attn.q_proj.weight", (512, 256)),
        ("self_attn.k_proj.weight", (256, 256)),
        ("self_attn.v_proj.weight", (256, 256)),
        ("self_attn.o_proj.weight", (256, 512)),
        ("mlp.gate_proj.weight", (512, 256)),
        ("mlp.up_proj.weight", (512, 256)),
        ("mlp.down_proj.weight", (256, 512)),
    ]:
        tensors[p + nm] = (rng.standard_normal(shape) * 0.02).astype(np.float32)
    save_file(tensors, os.path.join(path, "model.safetensors"))

    params = hf.load_hf_params(path, c)
    layer = params["layers"][0]
    assert "post_attn_norm" in layer and "post_mlp_norm" in layer
    assert "lm_head" not in params

    # forward runs
    cache = gemma2.init_cache(c, 1, 8)
    logits, _ = gemma2.forward(
        params, c, jnp.asarray([[1, 2]], jnp.int32), cache, jnp.int32(0)
    )
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
@pytest.mark.parametrize("num_bits", [4, 3])
def test_streaming_quantize_matches_in_memory(tmp_path, num_bits):
    """quantize_hf_model_streaming must produce a checkpoint whose planes,
    scales and tables are identical to the in-memory quantize path, with
    bounded buffering (the 70B enablement contract, VERDICT r1 item 2).
    At 3 bits both paths must pack the wide single-plane production
    layout (round-5 unification; previously streaming packed 2+1 planes)."""
    import dataclasses

    config = dataclasses.replace(
        llama.LlamaConfig.tiny(), rope_scaling_factor=None
    )
    params = llama.init_params(config, rng=0)
    src = str(tmp_path / "hf")
    _write_llama_ckpt(src, config, params)

    out_mem = str(tmp_path / "qmem")
    out_str = str(tmp_path / "qstr")
    hf.quantize_hf_model(src, out_mem, num_bits=num_bits, group_size=64)
    stats = hf.quantize_hf_model_streaming(
        src, out_str, num_bits=num_bits, group_size=64
    )
    # unfused streaming flushes every projection on arrival
    assert stats["buffered_high_water"] <= 1

    pm, _, _ = hf.load_quantized_model(out_mem)
    ps, cfg, sidecar = hf.load_quantized_model(out_str)
    assert sidecar["num_bits"] == num_bits
    for li in range(config.num_layers):
        for key in ("q", "k", "v", "o", "gate", "up", "down"):
            a, b = pm["layers"][li][key], ps["layers"][li][key]
            assert len(a.planes) == len(b.planes)
            if num_bits == 3:
                # wide layout = one plane (classic 3-bit packs 2+1)
                assert len(b.planes) == 1
            for pa, pb in zip(a.planes, b.planes):
                np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
            np.testing.assert_array_equal(
                np.asarray(a.scales, np.float32), np.asarray(b.scales, np.float32)
            )
            np.testing.assert_array_equal(
                np.asarray(a.table), np.asarray(b.table)
            )
    # dense leaves agree too
    np.testing.assert_array_equal(
        np.asarray(pm["embed"], np.float32), np.asarray(ps["embed"], np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(pm["lm_head"], np.float32),
        np.asarray(ps["lm_head"], np.float32),
    )

    # forward pass works end to end on the streamed checkpoint
    eng = Engine(params=ps, config=cfg, max_len=16, batch_size=1)
    toks = eng.generate([[1, 2, 3]], max_new_tokens=3)
    assert len(toks[0]) == 3


def test_streaming_quantize_fused(tmp_path):
    """Fused streaming: qkv/gate_up groups buffer at most one layer and
    match quantize_model(fuse=True)."""
    import dataclasses

    config = dataclasses.replace(
        llama.LlamaConfig.tiny(), rope_scaling_factor=None
    )
    params = llama.init_params(config, rng=0)
    src = str(tmp_path / "hf")
    _write_llama_ckpt(src, config, params)

    out = str(tmp_path / "qf")
    stats = hf.quantize_hf_model_streaming(
        src, out, num_bits=4, group_size=64, fuse=True
    )
    assert stats["buffered_high_water"] <= 5  # q,k,v + gate,up of one layer

    direct = llama.quantize_model(params, 4, 64, fuse=True)
    ps, _, _ = hf.load_quantized_model(out)
    for li in range(config.num_layers):
        for key in ("qkv", "gate_up", "o", "down"):
            a, b = direct["layers"][li][key], ps["layers"][li][key]
            for pa, pb in zip(a.planes, b.planes):
                np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
            np.testing.assert_array_equal(
                np.asarray(a.scales, np.float32), np.asarray(b.scales, np.float32)
            )


def test_streaming_quantize_gemma2(tmp_path):
    """Streaming quantization handles the Gemma-2 key map (sandwich norms,
    tied head) and matches in-memory quantization of the loaded params."""
    path = str(tmp_path / "g2s")
    os.makedirs(path)
    cfg = {
        "model_type": "gemma2", "vocab_size": 512, "hidden_size": 256,
        "intermediate_size": 512, "num_hidden_layers": 1,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 128,
        "rms_norm_eps": 1e-6, "query_pre_attn_scalar": 128,
        "attn_logit_softcapping": 50.0, "final_logit_softcapping": 30.0,
        "sliding_window": 8,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(3)
    tensors = {
        "model.embed_tokens.weight": rng.standard_normal((512, 256)).astype(np.float32),
        "model.norm.weight": np.zeros((256,), np.float32),
    }
    p = "model.layers.0."
    for nm in ("input_layernorm.weight", "post_attention_layernorm.weight",
               "pre_feedforward_layernorm.weight",
               "post_feedforward_layernorm.weight"):
        tensors[p + nm] = np.zeros((256,), np.float32)
    proj_shapes = {
        "self_attn.q_proj.weight": (512, 256),
        "self_attn.k_proj.weight": (256, 256),
        "self_attn.v_proj.weight": (256, 256),
        "self_attn.o_proj.weight": (256, 512),
        "mlp.gate_proj.weight": (512, 256),
        "mlp.up_proj.weight": (512, 256),
        "mlp.down_proj.weight": (256, 512),
    }
    for nm, shape in proj_shapes.items():
        tensors[p + nm] = (rng.standard_normal(shape) * 0.02).astype(np.float32)
    save_file(tensors, os.path.join(path, "model.safetensors"))

    out = str(tmp_path / "g2q")
    stats = hf.quantize_hf_model_streaming(path, out, num_bits=4, group_size=64)
    assert stats["buffered_high_water"] <= 1

    qparams, qcfg, sidecar = hf.load_quantized_model(out)
    assert isinstance(qcfg, gemma2.Gemma2Config)
    layer = qparams["layers"][0]
    assert "post_attn_norm" in layer and "post_mlp_norm" in layer
    assert "lm_head" not in qparams  # gemma2 always ties

    # agreement with the in-memory path on one projection
    dense = hf.load_hf_params(path, qcfg)
    direct = gemma2.quantize_model(dense, num_bits=4, group_size=64)
    a, b = direct["layers"][0]["q"], layer["q"]
    for pa, pb in zip(a.planes, b.planes):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    # end-to-end: a forward step runs
    import jax

    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    cache = gemma2.init_cache(qcfg, 1, 8)
    logits, _ = gemma2.forward(qparams, qcfg, tokens, cache, jnp.int32(0))
    assert np.isfinite(np.asarray(logits)).all()


def test_resolve_model_path_local_dir_untouched(tmp_path):
    """A local directory passes through without any hub machinery."""
    d = str(tmp_path / "local")
    os.makedirs(d)
    assert hf.resolve_model_path(d) == d


def test_resolve_model_path_rejects_nonsense():
    with pytest.raises(FileNotFoundError):
        hf.resolve_model_path("/no/such/directory")
    with pytest.raises(FileNotFoundError):
        hf.resolve_model_path("not-a-repo-id")


def test_load_quantized_model_from_hub_repo_id(tmp_path, monkeypatch):
    """A hub repo id resolves through snapshot_download and then loads like
    a local checkpoint (reference pulls its hub sidecar the same way,
    flute/integrations/huggingface.py:327-357). The hub call is stubbed —
    this environment has no egress — but the full loader path downstream
    of resolution is real."""
    import dataclasses

    config = dataclasses.replace(
        llama.LlamaConfig.tiny(), rope_scaling_factor=None
    )
    params = llama.init_params(config, rng=0)
    src = str(tmp_path / "hf")
    out = str(tmp_path / "quant")
    _write_llama_ckpt(src, config, params)
    hf.quantize_hf_model(src, out, num_bits=4, group_size=64)

    calls = {}

    def fake_snapshot_download(repo_id, revision=None, cache_dir=None,
                               allow_patterns=None):
        calls["repo_id"] = repo_id
        calls["revision"] = revision
        return out

    import huggingface_hub

    monkeypatch.setattr(
        huggingface_hub, "snapshot_download", fake_snapshot_download
    )
    qparams, qconfig, sidecar = hf.load_quantized_model("acme/tiny-w4")
    assert calls["repo_id"] == "acme/tiny-w4"
    assert sidecar["num_bits"] == 4
    assert qconfig.hidden_size == config.hidden_size
