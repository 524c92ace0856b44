"""Importer for reference-FLUTE checkpoint artifacts.

The reference ecosystem publishes pre-quantized models whose ``FluteLinear``
state holds ``weight int16 [P, K]`` (P = N * num_bits / 16) in a CUDA
MMA-thread-mapped bit layout, ``scales [N, K/group]``, ``tables [2^b]`` and
``tables2`` (pair table viewed as f32), plus ``{num_bits, group_size,
template_id}`` extra state (reference: flute/integrations/base.py:203-326,
flute/integrations/huggingface.py:86-236).

This module re-implements that bit layout in numpy — forward
(:func:`pack_reference_weight`, for fixtures/export) and inverse
(:func:`unpack_reference_weight`) — so flute-tpu can ingest reference
checkpoints without any CUDA/torch runtime. Layout derivation (all cited
against reference flute/utils.py):

* 4-bit (utils.py:59-91): codes ``C[K, N]`` are viewed as
  ``[K/2, 2, N/(4*tP), 4, tP]`` (tP = template tileP), last two dims
  transposed, then shuffled so that int16 word ``(row=2a+j, col=b*tP+p)``
  holds nibbles ``i = 0..3`` (LSB first) with::

      nibble_i = C[2a + 1 - (i & 1),  b*4*tP + (2j + i//2)*tP + p]

  i.e. each word interleaves the two K-adjacent rows (the CUDA kernel's
  __half2 pairs) across four N-positions. Finally ``[K, N/4] -> T -> [P, K]``.

* 2-bit (utils.py:94-134): same structure with eight 2-bit fields per word::

      field_i = C[2a + 1 - (i & 1),  b*8*tP + (4j + i//2)*tP + p]

* 3-bit (utils.py:137-253, tP = 32 only): a two-plane layout. Within each
  ``[2, 512]``-code chunk the values are first permuted to positions
  ``m = 0..31`` per ``p`` with ``q(m) = 3*((m//2) % 5) + (m//2)//5`` (m < 30,
  else q = 15) and row parity ``1 - (m & 1)``; the 96 bits per (chunk, p)
  (LSB-first, 3 per value) are then redistributed into three 16-bit lanes
  with the 2-bit tails of the odd row stitched from bit positions 90..96;
  lane 0 forms plane Q ``[K, N/16]`` and lanes 1-2 (transposed) plane Q2
  ``[K, N/8]``, concatenated then transposed to ``[3N/16, K]``.

The template_id -> tileP rule is distilled from the reference's generated
config registry (flute/data/qgemm_kernel_raw_generated_configs.pth, 216
entries): 2/3-bit use tileP=64 for template_id % 12 < 4 else 32; 4-bit uses
tileP=64 for template_id % 48 < 16 else 32.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from flute_tpu import packing


def tile_p_for_template(num_bits: int, template_id: int) -> int:
    """tileP of a reference template id (see module docstring for the rule's
    provenance)."""
    if num_bits in (2, 3):
        return 64 if template_id % 12 < 4 else 32
    if num_bits == 4:
        return 64 if template_id % 48 < 16 else 32
    raise ValueError(f"unsupported num_bits: {num_bits}")


# ---------------------------------------------------------------------------
# 2/4-bit layout
# ---------------------------------------------------------------------------


def _fields_per_word(num_bits: int) -> int:
    return 16 // num_bits


def _pack_24(codes: np.ndarray, num_bits: int, tile_p: int) -> np.ndarray:
    """Forward reference layout for 2/4-bit: ``[K, N]`` codes -> int16
    ``[N*b/16, K]``."""
    k, n = codes.shape
    r = _fields_per_word(num_bits)  # 4 or 8
    half = r // 2
    cs1 = tile_p * r
    if k % 2 or n % cs1:
        raise ValueError(f"K={k} (even) and N={n} (multiple of {cs1}) required")
    t = codes.reshape(k // 2, 2, n // cs1, r, tile_p).transpose(0, 1, 2, 4, 3)
    out = np.empty_like(t)  # [a, j, b, p, i]
    for j in range(2):
        for i in range(r):
            out[:, j, :, :, i] = t[:, 1 - (i & 1), :, :, half * j + i // 2]
    q2d = out.reshape(k, n).astype(np.uint32)
    qr = q2d.reshape(k, n // r, r)
    shifts = (num_bits * np.arange(r, dtype=np.uint32))[None, None, :]
    words = (qr << shifts).sum(axis=-1).astype(np.uint16)
    return words.T.copy().view(np.int16)


def _unpack_24(packed: np.ndarray, num_bits: int, tile_p: int) -> np.ndarray:
    """Inverse of :func:`_pack_24`: int16 ``[N*b/16, K]`` -> codes [K, N]."""
    r = _fields_per_word(num_bits)
    half = r // 2
    p_, k = packed.shape
    n = p_ * 16 // num_bits
    cs1 = tile_p * r
    words = np.ascontiguousarray(packed.T).view(np.uint16)  # [K, N/r]
    mask = np.uint32((1 << num_bits) - 1)
    q2d = np.empty((k, n), np.uint8)
    w32 = words.astype(np.uint32)
    for i in range(r):
        q2d[:, i::r] = ((w32 >> (num_bits * i)) & mask).astype(np.uint8)
    out = q2d.reshape(k // 2, 2, n // cs1, tile_p, r)
    t = np.empty_like(out)  # [a, c0, b, p, q]
    for j in range(2):
        for i in range(r):
            t[:, 1 - (i & 1), :, :, half * j + i // 2] = out[:, j, :, :, i]
    return (
        t.transpose(0, 1, 2, 4, 3).reshape(k, n).astype(np.int32)
    )


# ---------------------------------------------------------------------------
# 3-bit layout
# ---------------------------------------------------------------------------


def _q_of_m(m: int) -> int:
    return 3 * ((m // 2) % 5) + (m // 2) // 5 if m < 30 else 15


def _pack_3(codes: np.ndarray, tile_p: int = 32) -> np.ndarray:
    """Forward reference 3-bit layout: ``[K, N]`` codes -> int16
    ``[3N/16, K]`` (plane Q ∥ plane Q2)."""
    if tile_p != 32:
        raise ValueError("reference 3-bit layout is specialized to tileP=32")
    k, n = codes.shape
    cs1 = tile_p * 16  # 512
    if k % 2 or n % cs1:
        raise ValueError(f"K={k} (even) and N={n} (multiple of {cs1}) required")
    nb = n // cs1
    t = codes.reshape(k // 2, 2, nb, 16, tile_p).transpose(0, 1, 2, 4, 3)
    # permuted positions m = 0..31 per (chunk, p)
    mvals = np.empty((k // 2, nb, tile_p, 32), np.uint8)
    for m in range(32):
        mvals[..., m] = t[:, 1 - (m & 1), :, :, _q_of_m(m)]
    # 96 bits per (chunk, p): LSB-first, 3 per value
    bits = (mvals[..., None] >> np.arange(3, dtype=np.uint8)) & 1
    flat = bits.reshape(k // 2, nb, tile_p, 96)
    lanes = np.zeros((k // 2, 2, nb, tile_p, 3, 16), np.uint8)
    lanes[:, 0, :, :, 0, :] = flat[..., 0:16]
    lanes[:, 1, :, :, 0, 0:14] = flat[..., 16:30]
    lanes[:, 0, :, :, 1, :] = flat[..., 30:46]
    lanes[:, 1, :, :, 1, 0:14] = flat[..., 46:60]
    lanes[:, 0, :, :, 2, :] = flat[..., 60:76]
    lanes[:, 1, :, :, 2, 0:14] = flat[..., 76:90]
    lanes[:, 1, :, :, 0, 14:16] = flat[..., 90:92]
    lanes[:, 1, :, :, 1, 14:16] = flat[..., 92:94]
    lanes[:, 1, :, :, 2, 14:16] = flat[..., 94:96]

    shifts = (np.arange(16, dtype=np.uint32))[None, :]

    def to_words(b):  # [..., 16] bits -> uint16 words
        return ((b.astype(np.uint32) << shifts).sum(-1)).astype(np.uint16)

    plane0 = to_words(lanes[:, :, :, :, 0, :].reshape(-1, 16)).reshape(k, n // 16)
    plane1 = to_words(
        lanes[:, :, :, :, 1:, :].transpose(0, 1, 2, 4, 3, 5).reshape(-1, 16)
    ).reshape(k, n // 8)
    q = np.concatenate([plane0, plane1], axis=-1)  # [K, 3N/16]
    return q.T.copy().view(np.int16)


def _unpack_3(packed: np.ndarray, tile_p: int = 32) -> np.ndarray:
    """Inverse of :func:`_pack_3`."""
    if tile_p != 32:
        raise ValueError("reference 3-bit layout is specialized to tileP=32")
    p_, k = packed.shape
    n = p_ * 16 // 3
    cs1 = tile_p * 16
    nb = n // cs1
    q = np.ascontiguousarray(packed.T).view(np.uint16)  # [K, 3N/16]
    plane0 = q[:, : n // 16].astype(np.uint32)
    plane1 = q[:, n // 16:].astype(np.uint32)

    shifts = np.arange(16, dtype=np.uint32)

    def to_bits(w):  # uint words [..., W] -> [..., W, 16]
        return ((w[..., None] >> shifts) & 1).astype(np.uint8)

    lanes = np.zeros((k // 2, 2, nb, tile_p, 3, 16), np.uint8)
    lanes[:, :, :, :, 0, :] = to_bits(plane0).reshape(
        k // 2, 2, nb, tile_p, 16
    )
    lanes[:, :, :, :, 1:, :] = (
        to_bits(plane1)
        .reshape(k // 2, 2, nb, 2, tile_p, 16)
        .transpose(0, 1, 2, 4, 3, 5)
    )
    flat = np.empty((k // 2, nb, tile_p, 96), np.uint8)
    flat[..., 0:16] = lanes[:, 0, :, :, 0, :]
    flat[..., 16:30] = lanes[:, 1, :, :, 0, 0:14]
    flat[..., 30:46] = lanes[:, 0, :, :, 1, :]
    flat[..., 46:60] = lanes[:, 1, :, :, 1, 0:14]
    flat[..., 60:76] = lanes[:, 0, :, :, 2, :]
    flat[..., 76:90] = lanes[:, 1, :, :, 2, 0:14]
    flat[..., 90:92] = lanes[:, 1, :, :, 0, 14:16]
    flat[..., 92:94] = lanes[:, 1, :, :, 1, 14:16]
    flat[..., 94:96] = lanes[:, 1, :, :, 2, 14:16]
    bits = flat.reshape(k // 2, nb, tile_p, 32, 3)
    mvals = (bits << np.arange(3, dtype=np.uint8)).sum(-1).astype(np.uint8)
    t = np.empty((k // 2, 2, nb, tile_p, 16), np.uint8)
    for m in range(32):
        t[:, 1 - (m & 1), :, :, _q_of_m(m)] = mvals[..., m]
    return t.transpose(0, 1, 2, 4, 3).reshape(k, n).astype(np.int32)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def pack_reference_weight(
    codes: np.ndarray,
    num_bits: int,
    *,
    tile_p: Optional[int] = None,
    template_id: Optional[int] = None,
) -> np.ndarray:
    """Pack ``[K, N]`` codes into the reference's int16 ``[P, K]`` layout
    (for fixtures / exporting checkpoints the reference runtime can load)."""
    if tile_p is None:
        tile_p = 32 if template_id is None else tile_p_for_template(
            num_bits, template_id
        )
    if num_bits == 3:
        return _pack_3(np.asarray(codes), tile_p)
    if num_bits in (2, 4):
        return _pack_24(np.asarray(codes), num_bits, tile_p)
    raise ValueError(f"unsupported num_bits: {num_bits}")


def unpack_reference_weight(
    packed: np.ndarray,
    num_bits: int,
    *,
    tile_p: Optional[int] = None,
    template_id: Optional[int] = None,
) -> np.ndarray:
    """Recover ``[K, N]`` int32 codes from a reference-packed int16
    ``[P, K]`` weight (role of reference flute/utils.py:379-407 ``unpack``,
    which runs the CUDA kernel as its own inverse — here the layout is
    inverted directly on the host)."""
    if tile_p is None:
        if template_id is None:
            raise ValueError("need tile_p or template_id to unpack")
        tile_p = tile_p_for_template(num_bits, template_id)
    if num_bits == 3:
        return _unpack_3(np.asarray(packed), tile_p)
    if num_bits in (2, 4):
        return _unpack_24(np.asarray(packed), num_bits, tile_p)
    raise ValueError(f"unsupported num_bits: {num_bits}")


def convert_reference_tensors(
    weight: np.ndarray,
    scales: np.ndarray,
    tables: np.ndarray,
    num_bits: int,
    group_size: int,
    *,
    template_id: Optional[int] = None,
    tile_p: Optional[int] = None,
    chunk: int = packing.DEFAULT_CHUNK,
):
    """Convert one reference FluteLinear's tensors to flute-tpu format.

    Args:
      weight: int16 ``[P, K]`` reference-packed codes.
      scales: ``[N, K/group_size]`` (reference layout, base.py:211-214).
      tables: ``[2^b]`` lookup table.

    Returns:
      (planes, scales_kn, table): packed plane list for
      :func:`flute_tpu.qgemm`, scales transposed to ``[K/g, N]``, and the
      table as float32.
    """
    if tile_p is None and template_id is None:
        raise ValueError("need tile_p or template_id to convert")
    codes = unpack_reference_weight(
        weight, num_bits, tile_p=tile_p, template_id=template_id
    )
    k, n = codes.shape
    if scales.shape != (n, k // group_size):
        raise ValueError(
            f"scales shape {scales.shape} != expected [{n}, {k // group_size}]"
        )
    planes = packing.pack_np(codes, num_bits, chunk=chunk)
    scales_kn = np.ascontiguousarray(np.asarray(scales, np.float32).T)
    return planes, scales_kn, np.asarray(tables, np.float32)


def pair_values_from_tables2(
    tables2: np.ndarray, num_bits: int, *, dtype16: str = "float16"
) -> np.ndarray:
    """Decode a reference ``tables2`` buffer (qmap2: [E, E, 2] f16/bf16
    pairs bit-viewed as f32, reference flute/utils.py:15-33) into a
    float32 ``pair_values [E, E, 2]`` array — the vector-dequantization
    grid for ``lut_mode='pair_lut'`` (FLUTE-HIGGS checkpoints store the
    HIGGS grid here, reference integrations/higgs.py:66-69)."""
    import ml_dtypes

    e = 2 ** num_bits
    u32 = np.ascontiguousarray(tables2, dtype=np.float32).view(np.uint32)
    u32 = u32.reshape(e, e)
    half = {"float16": np.float16, "bfloat16": ml_dtypes.bfloat16}[dtype16]
    lo = (u32 & 0xFFFF).astype(np.uint16).view(half).astype(np.float32)
    hi = (u32 >> 16).astype(np.uint16).view(half).astype(np.float32)
    # little-endian: memory-order element 0 (the even K row) is the low half
    return np.stack([lo, hi], axis=-1)


def is_vector_tables2(
    tables2: np.ndarray, tables: np.ndarray, num_bits: int,
    *, dtype16: str = "float16",
) -> bool:
    """True when tables2 encodes a genuine 2-D vector grid rather than the
    scalar outer product make_qmap2_from_qmap builds (qmap2[i,j] =
    (qmap[i], qmap[j]))."""
    pv = pair_values_from_tables2(tables2, num_bits, dtype16=dtype16)
    t = np.asarray(tables, np.float32)
    outer0 = np.broadcast_to(t[:, None], pv.shape[:2])
    outer1 = np.broadcast_to(t[None, :], pv.shape[:2])
    return not (
        np.allclose(pv[..., 0], outer0, rtol=1e-2, atol=1e-3)
        and np.allclose(pv[..., 1], outer1, rtol=1e-2, atol=1e-3)
    )


def read_flute_config(model_dir: str) -> dict:
    """Read the sidecar ``flute_config.json`` the reference writes next to
    quantized checkpoints (reference base.py:356-367, huggingface.py:328-339)."""
    path = os.path.join(model_dir, "flute_config.json")
    with open(path) as f:
        cfg = json.load(f)
    for key in ("num_bits", "group_size"):
        if key not in cfg:
            raise ValueError(f"flute_config.json missing '{key}'")
    return cfg


_HF_LAYER_KEYS = {
    "input_layernorm": ("attn_norm", False),
    "self_attn.q_proj": ("q", True),
    "self_attn.k_proj": ("k", True),
    "self_attn.v_proj": ("v", True),
    "self_attn.o_proj": ("o", True),
    "post_attention_layernorm": ("mlp_norm", False),
    "mlp.gate_proj": ("gate", True),
    "mlp.up_proj": ("up", True),
    "mlp.down_proj": ("down", True),
}


def reference_to_model_checkpoint(
    model_dir: str,
    output_dir: str,
    *,
    tile_p: Optional[int] = None,
    template_id: Optional[int] = None,
) -> int:
    """Convert a reference-FLUTE Llama checkpoint into a *directly servable*
    flute-tpu model checkpoint: HF module names map into the flute-tpu
    params layout (``layers/<i>/<q|k|v|o|gate|up|down>``), so the output
    loads with ``load_quantized_model`` and runs in the serving engines —
    the complete migration path from the reference ecosystem
    (role of reference huggingface.py:327-357 from_pretrained).

    Returns the number of quantized layers converted.
    """
    import shutil

    import ml_dtypes

    from flute_tpu.integrations.checkpoint import StreamingWriter

    converted = load_reference_checkpoint(
        model_dir, tile_p=tile_p, template_id=template_id
    )
    writer = StreamingWriter(output_dir)
    bits = group = None
    n_layers = 0
    saw_lm_head = False

    def as_bf16(a):
        if a.dtype == np.uint16:
            a = a.view(ml_dtypes.bfloat16)
        return np.asarray(a, np.float32).astype(ml_dtypes.bfloat16)

    for name, val in sorted(converted.items()):
        is_q = isinstance(val, dict) and "planes" in val
        if name == "model.embed_tokens.weight":
            writer.add_array("embed", as_bf16(val))
        elif name == "model.norm.weight":
            writer.add_array("final_norm", as_bf16(val))
        elif name == "lm_head.weight":
            saw_lm_head = True
            writer.add_array(
                "lm_head", np.ascontiguousarray(as_bf16(val).T)
            )
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            li, sub = rest.split(".", 1)
            sub = sub[: -len(".weight")] if sub.endswith(".weight") else sub
            if sub not in _HF_LAYER_KEYS:
                continue
            key, is_linear = _HF_LAYER_KEYS[sub]
            if is_linear:
                if not is_q:
                    raise ValueError(f"expected quantized tensors at {name}")
                bits, group = val["num_bits"], val["group_size"]
                n_layers += 1
                writer.add_quantized(
                    f"layers/{li}/{key}",
                    val["planes"],
                    np.asarray(val["scales"], np.float32).astype(
                        ml_dtypes.bfloat16
                    ),
                    val["table"],
                    num_bits=bits,
                    group_size=group,
                )
            else:
                writer.add_array(f"layers/{li}/{key}", as_bf16(val))
    if not saw_lm_head:
        writer.add_none("lm_head")
    writer.finish(
        model_config={"source": model_dir, "imported": "flute-reference"},
        num_bits=bits,
        group_size=group,
    )
    for fname in ("config.json", "tokenizer.json", "tokenizer_config.json"):
        src = os.path.join(model_dir, fname)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(output_dir, fname))
    return n_layers


def load_reference_checkpoint(
    model_dir: str,
    *,
    tile_p: Optional[int] = None,
    template_id: Optional[int] = None,
) -> dict:
    """Load a reference-FLUTE HF checkpoint directory into flute-tpu tensors.

    Walks every safetensors file, converts each FluteLinear parameter group
    (``<prefix>.weight`` int16 + ``.scales`` + ``.tables``) and passes dense
    tensors through unchanged. Returns ``{name: tensor-or-layer-dict}`` where
    converted layers map ``<prefix>`` to ``{"planes": [...], "scales": ...,
    "table": ..., "num_bits": b, "group_size": g}``.
    """
    from safetensors import safe_open

    cfg = read_flute_config(model_dir)
    num_bits, group_size = cfg["num_bits"], cfg["group_size"]
    if template_id is None:
        template_id = cfg.get("template_id")
    if tile_p is None and template_id is None:
        raise ValueError(
            "reference checkpoints do not always record their pack tileP; "
            "pass tile_p= (32 or 64) or template_id= explicitly "
            "(the reference derives it from its legacy shape->template "
            "registry, flute/integrations/huggingface.py:86-170)"
        )

    tensors = {}
    files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no safetensors files in {model_dir}")
    for fn in files:
        with safe_open(os.path.join(model_dir, fn), framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)

    out = {}
    done = set()
    for key, val in tensors.items():
        if key in done:
            continue
        if key.endswith(".weight") and val.dtype == np.int16:
            prefix = key[: -len(".weight")]
            scales = tensors[prefix + ".scales"]
            tables = tensors[prefix + ".tables"]
            planes, s_kn, table = convert_reference_tensors(
                val, scales, tables, num_bits, group_size,
                tile_p=tile_p, template_id=template_id,
            )
            out[prefix] = {
                "planes": planes,
                "scales": s_kn,
                "table": table,
                "num_bits": num_bits,
                "group_size": group_size,
            }
            # FLUTE-HIGGS checkpoints carry the vector grid in tables2;
            # surface it as a pair_values table (lut_mode='pair_lut')
            t2 = tensors.get(prefix + ".tables2")
            if t2 is not None and is_vector_tables2(t2, tables, num_bits):
                out[prefix]["pair_values"] = pair_values_from_tables2(
                    t2, num_bits
                )
            done.update(
                {prefix + ".scales", prefix + ".tables", prefix + ".tables2"}
            )
        else:
            out[key] = val
    return out
