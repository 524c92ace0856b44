"""Llama-3/3.1 model family — TPU-native, LUT-quantized.

The reference never implements a model: it swaps ``FluteLinear`` into
HF/vLLM Llama modules (flute/integrations/base.py:45-200,
vllm_utils.py:119-226) and rides their forward pass. A standalone TPU
framework needs its own: this is a functional JAX Llama whose seven
projection matrices per block are :class:`flute_tpu.nn.QuantizedLinear`
leaves (or dense ``[in, out]`` arrays for the fake-quant/unquantized
baselines the reference's tests compare against, tests/vllm.py:57-82).

Design notes (TPU-first):
  * static shapes everywhere — prefill handles a fixed chunk, decode is a
    T=1 step against a preallocated KV cache; positions are explicit;
  * f32 softmax / RMSNorm statistics, bf16 everywhere else (MXU native);
  * GQA via reshape to [B, T, Hkv, rep, D] einsums — XLA maps these onto
    the MXU without materializing repeated KV;
  * the per-layer python loop unrolls under jit (quantized leaves have
    heterogeneous packed shapes, so lax.scan over stacked params does not
    apply);
  * tensor-parallel sharding is expressed as a PartitionSpec pytree from
    :func:`flute_tpu.parallel.llama_partition_specs` — the model code is
    SPMD-transparent.

Supported configs mirror the reference's model zoo (README.md:244-249):
Llama-3/3.1 8B/70B/405B.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu.nn import QuantizedLinear


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    # Llama-3.1 rope scaling ("llama3" type); None disables.
    rope_scaling_factor: Optional[float] = 8.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192
    tie_word_embeddings: bool = False
    dtype: Any = jnp.bfloat16

    @staticmethod
    def llama3_8b() -> "LlamaConfig":
        return LlamaConfig(rope_scaling_factor=None)

    @staticmethod
    def llama31_8b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def llama31_70b() -> "LlamaConfig":
        return LlamaConfig(
            hidden_size=8192,
            intermediate_size=28672,
            num_layers=80,
            num_heads=64,
            num_kv_heads=8,
        )

    @staticmethod
    def llama31_405b() -> "LlamaConfig":
        return LlamaConfig(
            hidden_size=16384,
            intermediate_size=53248,
            num_layers=126,
            num_heads=128,
            num_kv_heads=8,
        )

    @staticmethod
    def tiny(vocab_size: int = 512) -> "LlamaConfig":
        """A miniature config for tests / compile checks: real architecture
        (GQA, RoPE scaling, SwiGLU), toy sizes aligned to pack chunks."""
        return LlamaConfig(
            vocab_size=vocab_size,
            hidden_size=256,
            intermediate_size=512,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=128,  # keeps TP-local N >= 128 lanes at tp=2
        )


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def apply_linear(layer, x: jax.Array) -> jax.Array:
    """Dispatch over linear-leaf kinds: callable module (QuantizedLinear,
    LearnableQuantizedLinear) | dense [in, out] array."""
    if callable(layer) and not isinstance(layer, (jax.Array, np.ndarray)):
        return layer(x)
    return jnp.dot(x, layer.astype(x.dtype), preferred_element_type=jnp.float32).astype(
        x.dtype
    )


def split_fused_qkv(
    qkv: jax.Array, num_heads: int, num_kv_heads: int, head_dim: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Split a fused qkv projection output [B, T, W] into (q, k, v) heads.

    Local-shape-based: under tensor parallelism the fused layer is stored
    rank-major ([q_r | k_r | v_r] per rank — see
    :func:`flute_tpu.parallel.permute_fused_params`, the analogue of the
    reference's fused-partition shard metadata,
    flute/integrations/vllm_utils.py:119-226), so the local width is
    (qdim + 2*kvdim) / tp and every member width scales by the same factor.
    With tp=1 this is the plain global split.
    """
    b, t, w = qkv.shape
    d = head_dim
    total = (num_heads + 2 * num_kv_heads) * d
    f, rem = divmod(total, w)
    if rem or num_heads % f or num_kv_heads % f:
        raise ValueError(
            f"fused qkv width {w} is not a 1/tp slice of {total} "
            f"(heads {num_heads}/{num_kv_heads} must divide by tp)"
        )
    qd = num_heads * d // f
    kvd = num_kv_heads * d // f
    q = qkv[..., :qd].reshape(b, t, -1, d)
    k = qkv[..., qd:qd + kvd].reshape(b, t, -1, d)
    v = qkv[..., qd + kvd:].reshape(b, t, -1, d)
    return q, k, v


def _rope_inv_freq(config: LlamaConfig) -> np.ndarray:
    d = config.head_dim
    inv = 1.0 / (config.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    if config.rope_scaling_factor is not None:
        # Llama-3.1 NTK-by-parts scaling (matches HF "llama3" rope type).
        factor = config.rope_scaling_factor
        low = config.rope_original_max_position / config.rope_low_freq_factor
        high = config.rope_original_max_position / config.rope_high_freq_factor
        wavelen = 2 * np.pi / inv
        smooth = (config.rope_original_max_position / wavelen - config.rope_low_freq_factor) / (
            config.rope_high_freq_factor - config.rope_low_freq_factor
        )
        smooth = np.clip(smooth, 0.0, 1.0)
        scaled = (1 - smooth) * inv / factor + smooth * inv
        inv = np.where(wavelen > low, inv / factor, np.where(wavelen < high, inv, scaled))
    return inv.astype(np.float32)


def rope_tables(config: LlamaConfig, positions: jax.Array) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables ``[B, T, head_dim//2]`` for integer positions [B, T]."""
    inv = jnp.asarray(_rope_inv_freq(config))
    ang = positions.astype(jnp.float32)[..., None] * inv  # [B, T, D/2]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate ``[B, T, H, D]`` with per-(B,T) cos/sin [B, T, D/2].

    Uses the half-split convention (x1 = first half, x2 = second half),
    matching HF Llama.
    """
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def gqa_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,  # [B, Hkv, S, D]  (head-major cache layout)
    v: jax.Array,  # [B, Hkv, S, D]
    mask: jax.Array,  # [B, T, S] bool (True = attend)
    *,
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    """GQA attention over a head-major KV cache.

    The cache is [B, Hkv, S, D] so each (b, h) attention matmul reads a
    contiguous [S, D] block — the [B, S, H, D] layout made decode at long
    context ~7x slower (strided cache reads; measured on 8B @ S=2048).
    """
    b, t, h, d = q.shape
    hkv = k.shape[1]
    rep = h // hkv
    scale = scale if scale is not None else d**-0.5
    # [B, Hkv, rep*T, D]: plain batched matmuls against the contiguous
    # [B, Hkv, S, D] cache (exotic multi-batch einsum forms lack an eager
    # CPU lowering for bf16)
    qm = q.reshape(b, t, hkv, rep, d).transpose(0, 2, 3, 1, 4).reshape(
        b, hkv, rep * t, d
    )
    scores = jnp.matmul(
        qm, jnp.swapaxes(k, -1, -2), preferred_element_type=jnp.float32
    ) * scale  # [B, Hkv, rep*T, S]
    scores = scores.reshape(b, hkv, rep, t, -1)
    if logit_softcap is not None:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.matmul(
        probs.reshape(b, hkv, rep * t, -1), v, preferred_element_type=jnp.float32
    )  # [B, Hkv, rep*T, D]
    out = out.reshape(b, hkv, rep, t, d).transpose(0, 3, 1, 2, 4)
    return out.reshape(b, t, h, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_cache(
    config: LlamaConfig, batch: int, max_len: int, dtype=None
) -> dict:
    """Preallocated KV cache: per-layer head-major [B, Hkv, S, D] leaves.

    Per-layer *separate arrays* (not one stacked [L, ...] tensor) so each
    decode step only writes the layer it touches — XLA aliases the updates
    in place. A stacked tensor forces a read-modify-write chain across the
    whole cache that XLA copies (measured ~40 ms/step extra on 8B at
    S=2048). Head-major keeps per-head attention reads contiguous.
    """
    dtype = dtype or config.dtype
    shape = (batch, config.num_kv_heads, max_len, config.head_dim)
    return {
        "k": [jnp.zeros(shape, dtype) for _ in range(config.num_layers)],
        "v": [jnp.zeros(shape, dtype) for _ in range(config.num_layers)],
    }


def _cache_update(cache_layer: jax.Array, new: jax.Array, pos: jax.Array) -> jax.Array:
    """Write ``new`` [B, T, Hkv, D] into the [B, Hkv, S, D] cache at slot
    ``pos``.

    ``pos`` is a scalar (whole batch at one slot offset — plain decode) or
    a [B] vector (per-sequence offsets — continuous batching)."""
    new = jnp.swapaxes(new.astype(cache_layer.dtype), 1, 2)  # [B, Hkv, T, D]
    if pos.ndim == 0:
        return jax.lax.dynamic_update_slice(cache_layer, new, (0, 0, pos, 0))
    return jax.vmap(
        lambda c, n, p: jax.lax.dynamic_update_slice(c, n, (0, p, 0))
    )(cache_layer, new, pos)


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def _block(
    params: dict,
    config: LlamaConfig,
    x: jax.Array,  # [B, T, hidden]
    cos: jax.Array,
    sin: jax.Array,
    k_cache: jax.Array,  # [B, Hkv_local, S, D]
    v_cache: jax.Array,
    pos: jax.Array,  # scalar int32 write offset
    mask: jax.Array,  # [B, T, S]
    axis_name: Optional[str] = None,  # tp axis inside shard_map
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One transformer block. Under tensor parallelism (``axis_name`` set,
    running inside shard_map) q/k/v/gate/up are column-partitioned and
    o/down row-partitioned, with a single psum after each row-parallel
    matmul — Megatron-style TP with exactly two collectives per block,
    riding ICI (role of the reference's vLLM TP delegation, SURVEY §2.3).
    Head counts come from local tensor shapes, so the same code runs
    sharded and unsharded."""
    b, t, _ = x.shape
    d = config.head_dim
    h = rms_norm(x, params["attn_norm"], config.rms_norm_eps)
    if "qkv" in params:
        # fused projection (one kernel launch; role of vLLM's
        # QKVParallelLinear in the reference serving stack); the split is
        # local-shape-based so it works unsharded and inside shard_map
        qkv = apply_linear(params["qkv"], h)
        q, k, v = split_fused_qkv(
            qkv, config.num_heads, config.num_kv_heads, d
        )
    else:
        q = apply_linear(params["q"], h).reshape(b, t, -1, d)
        k = apply_linear(params["k"], h).reshape(b, t, -1, d)
        v = apply_linear(params["v"], h).reshape(b, t, -1, d)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    k_cache = _cache_update(k_cache, k, pos)
    v_cache = _cache_update(v_cache, v, pos)
    attn = gqa_attention(q, k_cache, v_cache, mask)
    o = apply_linear(params["o"], attn.reshape(b, t, -1))
    if axis_name is not None:
        o = jax.lax.psum(o, axis_name)
    x = x + o

    h = rms_norm(x, params["mlp_norm"], config.rms_norm_eps)
    if "gate_up" in params:
        gu = apply_linear(params["gate_up"], h)
        inter = gu.shape[-1] // 2
        gate, up = gu[..., :inter], gu[..., inter:]
    else:
        gate = apply_linear(params["gate"], h)
        up = apply_linear(params["up"], h)
    down = apply_linear(params["down"], jax.nn.silu(gate) * up)
    if axis_name is not None:
        down = jax.lax.psum(down, axis_name)
    x = x + down
    return x, k_cache, v_cache


def forward(
    params: dict,
    config: LlamaConfig,
    tokens: jax.Array,  # [B, T] int32
    cache: dict,
    pos: jax.Array,  # scalar int32: cache slot of tokens[:, 0]
    position_offsets: Optional[jax.Array] = None,  # [B] int32 left-pad widths
    axis_name: Optional[str] = None,  # tp axis when running inside shard_map
) -> tuple[jax.Array, dict]:
    """Run the model over a token chunk, returning logits [B, T, vocab] and
    the updated cache. Works for prefill (T = chunk) and decode (T = 1).

    Ragged batches are handled by *left-padding* prompts: sequence i's
    real tokens start at slot ``position_offsets[i]``; its RoPE position at
    slot j is ``j - position_offsets[i]`` and slots before the offset are
    masked out of attention permanently.
    """
    b, t = tokens.shape
    s = cache["k"][0].shape[2]  # per-layer [B, Hkv, S, D]
    x = params["embed"][tokens].astype(config.dtype)

    # pos: scalar (whole batch at one offset) or [B] (per-sequence slots,
    # continuous batching)
    pos = jnp.asarray(pos, jnp.int32)
    pos_col = pos[:, None] if pos.ndim == 1 else pos
    slots = pos_col + jnp.arange(t, dtype=jnp.int32)[None, :]  # [1|B, T]
    if position_offsets is None:
        positions = jnp.broadcast_to(slots, (b, t))
    else:
        positions = jnp.maximum(slots - position_offsets[:, None], 0)
    cos, sin = rope_tables(config, positions)

    # mask[b, i, j]: query in slot pos+i attends cache slot j iff j <= pos+i
    # and j is not a left-pad slot.
    js = jnp.arange(s, dtype=jnp.int32)[None, None, :]
    mask = jnp.broadcast_to(js <= slots[:, :, None], (b, t, s))
    if position_offsets is not None:
        mask = mask & (js >= position_offsets[:, None, None])

    # Per-layer cache leaves: each layer's update touches only its own
    # array, so XLA aliases the T-row write in place (see init_cache).
    ks, vs = [], []
    for li, layer in enumerate(params["layers"]):
        x, k_l, v_l = _block(
            layer, config, x, cos, sin, cache["k"][li], cache["v"][li], pos, mask,
            axis_name=axis_name,
        )
        ks.append(k_l)
        vs.append(v_l)
    new_cache = {"k": ks, "v": vs}

    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    head = params["lm_head"] if params.get("lm_head") is not None else params["embed"].T
    if isinstance(head, QuantizedLinear):
        logits = head(x)[..., :config.vocab_size]  # drop block padding
    else:
        logits = jnp.dot(
            x, head.astype(x.dtype), preferred_element_type=jnp.float32
        )
    return logits.astype(jnp.float32), new_cache


# ---------------------------------------------------------------------------
# Random init (tests / benchmarks)
# ---------------------------------------------------------------------------


def init_params(
    config: LlamaConfig, rng: np.random.Generator | int = 0, scale: float = 0.02
) -> dict:
    """Dense random params in the model's pytree layout.

    Linear leaves are ``[in, out]`` arrays (transpose of HF's [out, in]) so
    they can be fed directly to ``x @ w``; :func:`quantize_model` converts
    them to :class:`QuantizedLinear`.
    """
    if isinstance(rng, int):
        rng = np.random.default_rng(rng)
    c = config
    qdim = c.num_heads * c.head_dim
    kvdim = c.num_kv_heads * c.head_dim

    def lin(k_in, n_out):
        return jnp.asarray(
            rng.standard_normal((k_in, n_out)) * scale, dtype=c.dtype
        )

    layers = []
    for _ in range(c.num_layers):
        layers.append(
            {
                "attn_norm": jnp.ones((c.hidden_size,), c.dtype),
                "q": lin(c.hidden_size, qdim),
                "k": lin(c.hidden_size, kvdim),
                "v": lin(c.hidden_size, kvdim),
                "o": lin(qdim, c.hidden_size),
                "mlp_norm": jnp.ones((c.hidden_size,), c.dtype),
                "gate": lin(c.hidden_size, c.intermediate_size),
                "up": lin(c.hidden_size, c.intermediate_size),
                "down": lin(c.intermediate_size, c.hidden_size),
            }
        )
    return {
        "embed": jnp.asarray(
            rng.standard_normal((c.vocab_size, c.hidden_size)) * scale, dtype=c.dtype
        ),
        "layers": layers,
        "final_norm": jnp.ones((c.hidden_size,), c.dtype),
        "lm_head": None
        if c.tie_word_embeddings
        else lin(c.hidden_size, c.vocab_size),
    }


_PROJ_KEYS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_model(
    params: dict,
    num_bits: int = 4,
    group_size: int = 64,
    *,
    example_batch_size: int = 8,
    chunk: Optional[int] = None,
    fuse: bool = False,
    quantize_lm_head: bool = False,
    symmetric: Optional[bool] = None,
) -> dict:
    """Quantize every projection matrix in a Llama params pytree (the seven
    per-block linears; embeddings / norms / lm_head stay dense — same layer
    selection as the reference, flute/integrations/base.py:72-79 skipping
    lm_head via module name).

    ``fuse=True`` merges q/k/v into one ``qkv`` and gate/up into one
    ``gate_up`` projection (the single-device decode fast path; role of
    vLLM's QKVParallelLinear / MergedColumnParallelLinear in the reference
    serving stack). Fused layers are not TP-shardable in round 1 —
    parallel.validate_tp rejects them.
    """
    from flute_tpu.nn import quantize_linear

    kw = {}
    if chunk is not None:
        kw["chunk"] = chunk
    if symmetric is not None:
        kw["symmetric"] = symmetric
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new_layer = dict(layer)

        def quant(w):
            return quantize_linear(
                jnp.asarray(w).T,  # [in, out] -> [out, in]
                num_bits,
                group_size,
                example_batch_size=example_batch_size,
                **kw,
            )

        keys = _PROJ_KEYS
        if fuse:
            qkv = jnp.concatenate(
                [jnp.asarray(layer[k2]) for k2 in ("q", "k", "v")], axis=1
            )
            gate_up = jnp.concatenate(
                [jnp.asarray(layer[k2]) for k2 in ("gate", "up")], axis=1
            )
            new_layer["qkv"] = quant(qkv)
            new_layer["gate_up"] = quant(gate_up)
            for k2 in ("q", "k", "v", "gate", "up"):
                del new_layer[k2]
            keys = ("o", "down")
        for key in keys:
            w = layer[key]
            if isinstance(w, QuantizedLinear):
                new_layer[key] = w
                continue
            new_layer[key] = quant(w)
        out["layers"].append(new_layer)
    if quantize_lm_head and isinstance(params.get("lm_head"), (jnp.ndarray, jax.Array, np.ndarray)):
        # beyond reference parity (it never quantizes lm_head): at decode
        # the dense bf16 head reads hidden*vocab*2 bytes/step — on 8B that
        # is ~20% of all weight traffic. Logits round through bf16.
        # Vocab sizes rarely divide into good kernel blocks (128256 =
        # 128*1002) — pad out-features to a 2048 multiple; forward slices
        # the logits back to vocab_size.
        w = jnp.asarray(params["lm_head"])
        pad = (-w.shape[1]) % 2048
        if pad:
            w = jnp.pad(w, ((0, 0), (0, pad)))
        out["lm_head"] = quant(w)
    return out
