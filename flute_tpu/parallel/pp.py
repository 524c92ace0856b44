"""Pipeline parallelism: layer stages placed on successive devices.

The reference's PP story is accelerate's layer-wise ``device_map``
placement plus vLLM PP (SURVEY §2.3: "no FLUTE-specific code") — weights of
different layers live on different accelerators and activations flow
through. The JAX equivalent implemented here: contiguous layer stages are
``device_put`` on successive devices; each stage's forward is jitted on its
device; the [B, T, hidden] activation hops stage-to-stage over ICI. For
decode serving this overlaps naturally across a batch of requests
(stage s works on step t while stage s+1 works on step t-1) when driven by
the continuous-batching engine; here we provide the correct sequential
composition plus stage-cache management.

Composable with TP: pass a list of per-stage Meshes instead of devices and
stage params already sharded (not wired in round 1 — single-axis PP only).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from flute_tpu.models import llama


def split_stages(params: dict, num_stages: int) -> list[dict]:
    """Split a Llama-layout params tree into ``num_stages`` stage subtrees.
    Stage 0 carries the embedding; the last stage carries final_norm and
    lm_head. Layers are split contiguously as evenly as possible."""
    layers = params["layers"]
    n = len(layers)
    base, rem = divmod(n, num_stages)
    sizes = [base + (1 if i < rem else 0) for i in range(num_stages)]
    stages = []
    start = 0
    for i, sz in enumerate(sizes):
        stage: dict = {"layers": layers[start:start + sz]}
        if i == 0:
            stage["embed"] = params["embed"]
        if i == num_stages - 1:
            stage["final_norm"] = params["final_norm"]
            stage["lm_head"] = params.get("lm_head")
            if "embed" not in stage and params.get("lm_head") is None:
                stage["embed"] = params["embed"]  # tied head needs embed
        stages.append(stage)
        start += sz
    return stages


@dataclasses.dataclass
class PipelinedModel:
    """Stage-placed model with the same (tokens, cache, pos) step contract
    as llama.forward (cache is a list of per-stage caches)."""

    config: Any
    stages: list[dict]
    devices: Sequence[Any]

    @staticmethod
    def build(
        params: dict,
        config: Any,
        num_stages: Optional[int] = None,
        devices: Optional[Sequence[Any]] = None,
    ) -> "PipelinedModel":
        devices = list(devices if devices is not None else jax.devices())
        num_stages = num_stages or len(devices)
        devices = devices[:num_stages]
        stages = split_stages(params, num_stages)
        placed = [
            jax.device_put(s, d) for s, d in zip(stages, devices)
        ]
        return PipelinedModel(config=config, stages=placed, devices=devices)

    def init_cache(self, batch: int, max_len: int) -> list[dict]:
        c = self.config
        out = []
        for stage, dev in zip(self.stages, self.devices):
            nl = len(stage["layers"])
            shape = (batch, c.num_kv_heads, max_len, c.head_dim)
            cache = {
                "k": [jnp.zeros(shape, c.dtype) for _ in range(nl)],
                "v": [jnp.zeros(shape, c.dtype) for _ in range(nl)],
            }
            out.append(jax.device_put(cache, dev))
        return out

    def _stage_fn(self, stage_idx: int) -> Callable:
        config = self.config
        is_first = stage_idx == 0
        is_last = stage_idx == len(self.stages) - 1

        @jax.jit
        def run(stage, x_or_tokens, cache, pos, offsets):
            if is_first:
                x = stage["embed"][x_or_tokens].astype(config.dtype)
            else:
                x = x_or_tokens
            b, t = x.shape[:2]
            s = cache["k"][0].shape[2]  # per-layer [B, Hkv, S, D]
            # pos: scalar or [B] vector (continuous batching) — same
            # contract as llama.forward:329
            pos_col = pos[:, None] if pos.ndim == 1 else pos
            slots = pos_col + jnp.arange(t, dtype=jnp.int32)[None, :]
            if offsets is None:
                positions = jnp.broadcast_to(slots, (b, t))
            else:
                positions = jnp.maximum(slots - offsets[:, None], 0)
            cos, sin = llama.rope_tables(config, positions)
            js = jnp.arange(s, dtype=jnp.int32)[None, None, :]
            mask = jnp.broadcast_to(js <= slots[:, :, None], (b, t, s))
            if offsets is not None:
                mask = mask & (js >= offsets[:, None, None])

            ks, vs = [], []
            for li, layer in enumerate(stage["layers"]):
                x, k_l, v_l = llama._block(
                    layer, config, x, cos, sin, cache["k"][li], cache["v"][li],
                    pos, mask,
                )
                ks.append(k_l)
                vs.append(v_l)
            new_cache = {"k": ks, "v": vs}
            if not is_last:
                return x, new_cache
            x = llama.rms_norm(x, stage["final_norm"], config.rms_norm_eps)
            head = stage.get("lm_head")
            if head is None:
                head = stage["embed"].T
            # identical arithmetic to llama.forward's head (f32 logits,
            # no intermediate bf16 rounding)
            from flute_tpu.nn import QuantizedLinear

            logits = (
                head(x)[..., :config.vocab_size]  # drop block padding
                if isinstance(head, QuantizedLinear)
                else jnp.dot(
                    x, head.astype(x.dtype), preferred_element_type=jnp.float32
                )
            )
            return logits.astype(jnp.float32), new_cache

        return run

    def __post_init__(self):
        self._fns = [self._stage_fn(i) for i in range(len(self.stages))]

    def forward(
        self,
        tokens: jax.Array,
        caches: list[dict],
        pos,
        position_offsets: Optional[jax.Array] = None,
    ):
        """Run all stages sequentially; activations hop devices over ICI."""
        pos = jnp.asarray(pos, jnp.int32)
        x = tokens
        new_caches = []
        for i, (fn, stage, dev) in enumerate(
            zip(self._fns, self.stages, self.devices)
        ):
            x = jax.device_put(x, dev)
            offs = (
                None
                if position_offsets is None
                else jax.device_put(position_offsets, dev)
            )
            x, cache_i = fn(stage, x, caches[i], jax.device_put(pos, dev), offs)
            new_caches.append(cache_i)
        return x, new_caches

    def forward_microbatched(
        self,
        tokens: jax.Array,
        caches: list[dict],
        pos,
        position_offsets: Optional[jax.Array] = None,
        num_microbatches: int = 2,
    ):
        """GPipe-style microbatched forward: the batch splits into
        ``num_microbatches`` chunks whose stage executions overlap across
        devices — stage s computes microbatch m while stage s+1 computes
        m-1. The overlap comes from JAX's async dispatch: microbatch m's
        stage-(s+1) call depends only on its own stage-s output, so every
        device's queue stays busy through the fill/drain ramp instead of
        the whole pipeline serializing per batch (the r1 sequential
        ``forward``'s weakness).

        Identical math to ``forward`` (batch rows are independent);
        returns the same (logits, caches) contract.
        """
        b = tokens.shape[0]
        m = min(num_microbatches, b)
        if b % m:
            raise ValueError(f"batch {b} not divisible by {m} microbatches")
        mb = b // m
        pos = jnp.asarray(pos, jnp.int32)
        pos_vec = pos.ndim == 1

        logits_parts = []
        cache_parts: list[list] = [[] for _ in self.stages]
        for mi in range(m):
            sl = slice(mi * mb, (mi + 1) * mb)
            x = tokens[sl]
            for i, (fn, stage, dev) in enumerate(
                zip(self._fns, self.stages, self.devices)
            ):
                x = jax.device_put(x, dev)
                offs = (
                    None
                    if position_offsets is None
                    else jax.device_put(position_offsets[sl], dev)
                )
                cache_mi = jax.tree.map(lambda a, s_=sl: a[s_], caches[i])
                p = pos[sl] if pos_vec else pos
                x, cache_i = fn(
                    stage, x, cache_mi, jax.device_put(p, dev), offs
                )
                cache_parts[i].append(cache_i)
            logits_parts.append(x)
        logits = jnp.concatenate(logits_parts, axis=0)
        new_caches = [
            jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
            for parts in cache_parts
        ]
        return logits, new_caches
