"""HuggingFace checkpoint interop: load dense HF Llama/Gemma-2 weights into
the flute-tpu pytree, quantize, and save/load the quantized result.

Role-equivalent of the reference's HF story, redesigned for JAX:
  * ``load_hf_params`` replaces transformers model surgery
    (replace_with_flute_linear, reference huggingface.py:86-170) — we read
    the safetensors shards directly into the functional pytree, no torch
    module tree involved;
  * ``quantize_hf_model`` is the quantize-and-save driver (reference
    base.py:329-367 + CLI :370-388);
  * ``load_quantized_model`` restores a quantized checkpoint and refits
    kernel configs for the current deployment (reference
    _repack_flute_linear, huggingface.py:173-236 — minus the repack, which
    the TPU layout makes unnecessary).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from flute_tpu.integrations import checkpoint as ckpt_io
from flute_tpu.models import llama as llama_mod

_LLAMA_LAYER_KEYS = {
    "input_layernorm.weight": ("attn_norm", False),
    "self_attn.q_proj.weight": ("q", True),
    "self_attn.k_proj.weight": ("k", True),
    "self_attn.v_proj.weight": ("v", True),
    "self_attn.o_proj.weight": ("o", True),
    "post_attention_layernorm.weight": ("mlp_norm", False),
    "mlp.gate_proj.weight": ("gate", True),
    "mlp.up_proj.weight": ("up", True),
    "mlp.down_proj.weight": ("down", True),
}

# Gemma-2 sandwich norms (HF names -> flute-tpu layer keys)
_GEMMA2_LAYER_KEYS = {
    **_LLAMA_LAYER_KEYS,
    "post_attention_layernorm.weight": ("post_attn_norm", False),
    "pre_feedforward_layernorm.weight": ("mlp_norm", False),
    "post_feedforward_layernorm.weight": ("post_mlp_norm", False),
}


def resolve_model_path(
    path_or_repo: str,
    *,
    revision: Optional[str] = None,
    cache_dir: Optional[str] = None,
    allow_patterns: Optional[list] = None,
) -> str:
    """Resolve a local directory or an HF-hub repo id to a local directory.

    The reference pulls its quantization sidecar from the hub when the
    model id is remote (flute/integrations/huggingface.py:327-357); the
    TPU port accepts hub repo ids on every loader entry point and
    snapshots them through ``huggingface_hub`` (already a transformers
    dependency). Local paths are returned untouched, so fully-offline
    deployments never import or touch the hub.
    """
    if os.path.isdir(path_or_repo):
        return path_or_repo
    looks_remote = (
        "/" in path_or_repo
        and not os.path.isabs(path_or_repo)
        and not path_or_repo.startswith(".")
    )
    if not looks_remote:
        raise FileNotFoundError(
            f"{path_or_repo!r} is neither a local directory nor an HF-hub "
            "repo id (expected 'org/name')"
        )
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover - hub ships with transformers
        raise ImportError(
            f"loading {path_or_repo!r} from the HF hub requires "
            "huggingface_hub"
        ) from e
    return snapshot_download(
        repo_id=path_or_repo,
        revision=revision,
        cache_dir=cache_dir,
        allow_patterns=allow_patterns,
    )


def _open_safetensor_shards(model_dir: str):
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)["weight_map"]
        shards = {}
        for name, shard in index.items():
            shards.setdefault(shard, []).append(name)
        for shard in sorted(shards):
            with safe_open(os.path.join(model_dir, shard), framework="np") as f:
                for name in shards[shard]:
                    yield name, f.get_tensor(name)
    else:
        path = os.path.join(model_dir, "model.safetensors")
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def model_type_of(model_dir: str) -> str:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f).get("model_type", "llama")


def config_from_hf(model_dir: str):
    """Translate an HF config.json into the matching flute-tpu config
    (LlamaConfig or Gemma2Config, by model_type)."""
    if model_type_of(model_dir) == "gemma2":
        return _gemma2_config_from_hf(model_dir)
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    rope_scaling = hf.get("rope_scaling") or {}
    scaling_type = rope_scaling.get("rope_type") or rope_scaling.get("type")
    return llama_mod.LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=hf.get(
            "head_dim", hf["hidden_size"] // hf["num_attention_heads"]
        ),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_scaling_factor=(
            rope_scaling.get("factor") if scaling_type == "llama3" else None
        ),
        rope_low_freq_factor=rope_scaling.get("low_freq_factor", 1.0),
        rope_high_freq_factor=rope_scaling.get("high_freq_factor", 4.0),
        rope_original_max_position=rope_scaling.get(
            "original_max_position_embeddings", 8192
        ),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


def _gemma2_config_from_hf(model_dir: str):
    from flute_tpu.models import gemma2

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return gemma2.Gemma2Config(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=hf.get("head_dim", 256),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        query_pre_attn_scalar=float(hf.get("query_pre_attn_scalar", 256)),
        attn_logit_softcap=hf.get("attn_logit_softcapping", 50.0),
        final_logit_softcap=hf.get("final_logit_softcapping", 30.0),
        sliding_window=hf.get("sliding_window", 4096),
    )


def _to_jnp(arr: np.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    if arr.dtype == np.uint16 or str(arr.dtype) == "bfloat16":
        return jnp.asarray(arr).view(jnp.bfloat16).astype(dtype)
    return jnp.asarray(arr).astype(dtype)


def load_hf_params(model_dir: str, config=None, dtype=jnp.bfloat16) -> dict:
    """Read an HF Llama/Gemma-2 safetensors checkpoint into the flute-tpu
    params pytree (linear leaves transposed to [in, out]). ``model_dir``
    may be a local directory or an HF-hub repo id."""
    model_dir = resolve_model_path(model_dir)
    mtype = model_type_of(model_dir)
    config = config or config_from_hf(model_dir)
    key_map = _GEMMA2_LAYER_KEYS if mtype == "gemma2" else _LLAMA_LAYER_KEYS
    layers = [dict() for _ in range(config.num_layers)]
    params: dict = {"layers": layers}
    if mtype != "gemma2":
        params["lm_head"] = None
    for name, tensor in _open_safetensor_shards(model_dir):
        if name == "model.embed_tokens.weight":
            params["embed"] = _to_jnp(tensor, dtype)
        elif name == "model.norm.weight":
            params["final_norm"] = _to_jnp(tensor, dtype)
        elif name == "lm_head.weight" and mtype != "gemma2":
            params["lm_head"] = _to_jnp(tensor, dtype).T
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            li, sub = rest.split(".", 1)
            if sub not in key_map:
                continue
            key, is_linear = key_map[sub]
            t = _to_jnp(tensor, dtype)
            layers[int(li)][key] = t.T if is_linear else t
        # rotary inv_freq buffers etc. are recomputed, not loaded
    if mtype == "gemma2":
        params.pop("lm_head", None)  # always tied; forward uses embed.T
    elif getattr(config, "tie_word_embeddings", False):
        params["lm_head"] = None
    return params


def quantize_hf_model(
    model_dir: str,
    output_dir: str,
    num_bits: int = 4,
    group_size: int = 64,
    *,
    fake: bool = False,
    example_batch_size: int = 8,
    dtype=jnp.bfloat16,
) -> None:
    """Load → NF-quantize → save with sidecar (reference quantize_hf_model,
    base.py:329-367). ``fake=True`` saves the fake-quantized dense model
    instead (the reference's testing mode, base.py:85-102). ``model_dir``
    may be a local directory or an HF-hub repo id."""
    model_dir = resolve_model_path(model_dir)
    config = config_from_hf(model_dir)
    params = load_hf_params(model_dir, config, dtype)
    if fake:
        from flute_tpu.quantize import nf

        for layer in params["layers"]:
            for key in llama_mod._PROJ_KEYS:
                w = jnp.asarray(layer[key]).T
                layer[key] = nf.nf_quantize_fake(w, num_bits, group_size, dtype).T
        qparams = params
    else:
        qparams = llama_mod.quantize_model(
            params, num_bits, group_size, example_batch_size=example_batch_size
        )
    ckpt_io.save_quantized(
        output_dir,
        qparams,
        model_config={"model_type": model_type_of(model_dir), "source": model_dir},
        num_bits=num_bits,
        group_size=group_size,
    )
    # copy tokenizer/config files alongside for a self-contained checkpoint
    for fname in ("config.json", "tokenizer.json", "tokenizer_config.json"):
        src = os.path.join(model_dir, fname)
        if os.path.exists(src):
            import shutil

            shutil.copy(src, os.path.join(output_dir, fname))


def quantize_hf_model_streaming(
    model_dir: str,
    output_dir: str,
    num_bits: int = 4,
    group_size: int = 64,
    *,
    fuse: bool = False,
    example_batch_size: int = 8,
    quantize_lm_head: bool = False,
) -> dict:
    """Layer-streaming quantization with bounded host memory.

    Unlike :func:`quantize_hf_model` (which materializes the whole dense
    pytree — ~140 GB host RAM for 70B bf16), this walks the safetensors
    shards tensor-by-tensor, NF-quantizes + packs each projection on the
    host (numpy + the native packer), flushes it to the output checkpoint
    immediately, and frees it. Peak residency is one fused projection group
    (the reference's whole-model ``device_map="cpu"`` load, base.py:333-340,
    has no streaming equivalent — this is the 70B/405B enablement path).

    Returns ``{"buffered_high_water": int}`` stats (max projection tensors
    simultaneously buffered — bounded by one decoder layer).
    """
    import ml_dtypes

    from flute_tpu import packing as packing_mod
    from flute_tpu.ops.kernel_config import get_kernel_config
    from flute_tpu.quantize import nf

    model_dir = resolve_model_path(model_dir)
    mtype = model_type_of(model_dir)
    key_map = _GEMMA2_LAYER_KEYS if mtype == "gemma2" else _LLAMA_LAYER_KEYS
    writer = ckpt_io.StreamingWriter(output_dir)
    tie = False
    try:
        with open(os.path.join(model_dir, "config.json")) as f:
            tie = bool(json.load(f).get("tie_word_embeddings", False))
    except FileNotFoundError:
        pass

    def _np_f32(arr: np.ndarray) -> np.ndarray:
        if arr.dtype == np.uint16:
            arr = arr.view(ml_dtypes.bfloat16)
        return np.asarray(arr, np.float32)

    def quant_store(tree_path: str, w_nk: np.ndarray) -> None:
        """NF-quantize an [out, in] dense weight and flush it."""
        n, k = w_nk.shape
        # round through bf16 first so codes match the in-memory path
        # (load_hf_params loads at bf16 before quantize_model quantizes)
        w_nk = w_nk.astype(ml_dtypes.bfloat16).astype(np.float32)
        # production 4-bit ships the sign-symmetric grid + w4sym fast
        # layout, same default as nn.quantize_linear
        if num_bits == 4:
            codes, scales, table = nf.nf_quantize_symmetric_np(
                w_nk, num_bits, group_size
            )
            planes = packing_mod.pack_w4_sym_np(np.ascontiguousarray(codes.T))
            layout = "w4sym"
        elif num_bits == 3 and k % packing_mod.DEFAULT_CHUNK == 0:
            # wide single-plane 3-bit: same production layout as the
            # in-memory path (nn.quantize_linear wide default; ~45% faster
            # decode than the classic 2+1-plane layout, docs/KERNEL_NOTES.md)
            codes, scales, table = nf.nf_quantize_np(w_nk, num_bits, group_size)
            planes = packing_mod.pack_w3_wide_np(np.ascontiguousarray(codes.T))
            layout = "auto"  # wide is detected from the plane shape on load
        else:
            codes, scales, table = nf.nf_quantize_np(w_nk, num_bits, group_size)
            planes = packing_mod.pack_np(
                np.ascontiguousarray(codes.T), num_bits
            )
            layout = "auto"
        cfg = get_kernel_config(
            example_batch_size, n, k, num_bits, group_size, layout=layout
        )
        writer.add_quantized(
            tree_path,
            planes,
            np.ascontiguousarray(scales.T).astype(ml_dtypes.bfloat16),
            table.astype(np.float32),
            num_bits=num_bits,
            group_size=group_size,
            config_key=cfg.key(),
            layout=layout,
        )

    pending: dict[int, dict[str, np.ndarray]] = {}
    high_water = 0
    fuse_groups = (
        {"qkv": ("q", "k", "v"), "gate_up": ("gate", "up")} if fuse else {}
    )
    fused_members = {m for grp in fuse_groups.values() for m in grp}

    def flush_ready(li: int) -> None:
        buf = pending.get(li)
        if not buf:
            return
        for fused_key, members in fuse_groups.items():
            if all(m in buf for m in members):
                w = np.concatenate([buf.pop(m) for m in members], axis=0)
                quant_store(f"layers/{li}/{fused_key}", w)
        for key in list(buf):
            if key not in fused_members:
                quant_store(f"layers/{li}/{key}", buf.pop(key))
        if not buf:
            del pending[li]

    saw_lm_head = False
    for name, tensor in _open_safetensor_shards(model_dir):
        if name == "model.embed_tokens.weight":
            writer.add_array("embed", _np_f32(tensor).astype(ml_dtypes.bfloat16))
        elif name == "model.norm.weight":
            writer.add_array(
                "final_norm", _np_f32(tensor).astype(ml_dtypes.bfloat16)
            )
        elif name == "lm_head.weight" and mtype != "gemma2":
            saw_lm_head = True
            if quantize_lm_head:
                quant_store("lm_head", _np_f32(tensor))
            else:
                writer.add_array(
                    "lm_head",
                    np.ascontiguousarray(_np_f32(tensor).T).astype(
                        ml_dtypes.bfloat16
                    ),
                )
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            li_s, sub = rest.split(".", 1)
            if sub not in key_map:
                continue
            key, is_linear = key_map[sub]
            li = int(li_s)
            if not is_linear:
                writer.add_array(
                    f"layers/{li}/{key}",
                    _np_f32(tensor).astype(ml_dtypes.bfloat16),
                )
                continue
            pending.setdefault(li, {})[key] = _np_f32(tensor)
            high_water = max(
                high_water, sum(len(b) for b in pending.values())
            )
            flush_ready(li)
        del tensor
    for li in list(pending):
        flush_ready(li)
    if pending:
        raise ValueError(f"incomplete layers in checkpoint: {sorted(pending)}")
    if mtype != "gemma2" and (tie or not saw_lm_head):
        writer.add_none("lm_head")

    writer.finish(
        model_config={"model_type": mtype, "source": model_dir},
        num_bits=num_bits,
        group_size=group_size,
    )
    for fname in ("config.json", "tokenizer.json", "tokenizer_config.json"):
        src = os.path.join(model_dir, fname)
        if os.path.exists(src):
            import shutil

            shutil.copy(src, os.path.join(output_dir, fname))
    return {"buffered_high_water": high_water}


def model_fns(model_type: str):
    """(forward, init_cache) pair for a model_type string."""
    if model_type == "gemma2":
        from flute_tpu.models import gemma2

        return gemma2.forward, gemma2.init_cache
    return llama_mod.forward, llama_mod.init_cache


def load_quantized_model(
    path: str, *, batch_size: Optional[int] = None, retune: bool = False
) -> tuple[dict, Any, dict]:
    """Load a quantized checkpoint; returns (params, LlamaConfig, sidecar).

    With ``retune=True``, re-tunes each layer's kernel config for
    ``batch_size`` on the current device (reference repack-on-load flow,
    huggingface.py:173-236 — here a pure metadata update). ``path`` may be
    a local directory or an HF-hub repo id holding a flute-tpu checkpoint
    (the reference resolves its hub sidecar the same way,
    huggingface.py:327-357)."""
    path = resolve_model_path(path)
    params, sidecar = ckpt_io.load_quantized(path)
    hf_config_path = os.path.join(path, "config.json")
    config = config_from_hf(path) if os.path.exists(hf_config_path) else None
    if retune and batch_size is not None:
        from flute_tpu import tune
        from flute_tpu.nn import QuantizedLinear

        for layer in params["layers"]:
            for key, v in list(layer.items()):
                if isinstance(v, QuantizedLinear):
                    layer[key] = tune.tune_linear(v, batch_size)
    return params, config, sidecar
