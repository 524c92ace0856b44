"""Serving engine: jitted prefill/decode steps and a batch generation loop.

The reference delegates serving entirely to vLLM (flute/integrations/
vllm.py, vllm_utils.py) — its own surface is just the per-layer ``apply``.
A standalone TPU framework owns the loop: static-shape prefill + T=1 decode
steps compiled once, a slot-based batch so finished sequences are masked
(not removed — shapes never change), and greedy or temperature sampling.

TPU-first details:
  * prompts are right-aligned into a padded [B, P] block so a single
    prefill step (one compilation) serves every prompt length;
  * the decode loop runs on host with device steps — the idiomatic serving
    shape for an interactive engine; a fully-fused ``lax.while_loop``
    variant (:func:`greedy_generate_fused`) covers offline batch
    generation and is what the benchmark uses (zero host round-trips).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu.models import llama


def sample_logits(
    rng: jax.Array,
    logits: jax.Array,  # [B, V] float32
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> jax.Array:
    """Temperature / top-k / top-p (nucleus) sampling; greedy when
    temperature == 0. The sampling surface the reference outsources to
    vLLM's sampler."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k is not None:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set whose cumulative prob >= top_p; keep at least 1
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(
            sorted_logits, cutoff_idx[:, None], axis=-1
        )
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


@dataclasses.dataclass
class Engine:
    """Compiled prefill/decode wrapper around a model forward function.

    ``forward(params, config, tokens, cache, pos)`` is the model contract
    (llama.forward-compatible: returns (logits [B, T, V], new_cache)).
    """

    params: Any
    config: Any
    forward: Callable = llama.forward
    init_cache: Callable = llama.init_cache  # (config, batch, max_len) -> cache
    max_len: int = 1024
    batch_size: int = 8
    pad_id: int = 0
    # Tensor-parallel serving: a Mesh with a "tp" axis turns every compiled
    # step into a shard_map TP program (params get sharded here; the step
    # contract is unchanged). Role of the reference's vLLM TP workers
    # (flute/integrations/vllm_utils.py). Fused qkv/gate_up params must be
    # rank-major permuted first (parallel.permute_fused_params).
    mesh: Any = None
    params_specs: Any = None

    def __post_init__(self):
        fwd = self._setup_forward()
        config = self.config

        # the KV cache is donated: each step updates it in place on device
        @functools.partial(jax.jit, donate_argnums=(2,))
        def prefill_step(params, tokens, cache, offsets):
            logits, cache = fwd(params, config, tokens, cache, jnp.int32(0), offsets)
            return logits[:, -1], cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_step(params, tokens, cache, pos, offsets):
            logits, cache = fwd(params, config, tokens, cache, pos, offsets)
            return logits[:, -1], cache

        self._prefill = prefill_step
        self._decode = decode_step

    def _setup_forward(self) -> Callable:
        """The model forward the compiled steps close over; under a mesh it
        is the shard_map TP wrapper and params are placed onto the mesh."""
        if self.mesh is None:
            return self.forward
        from flute_tpu.parallel import (
            llama_partition_specs,
            shard_params,
            tp_model_forward,
        )

        if self.params_specs is None:
            self.params_specs = llama_partition_specs(self.params)
        self.params = shard_params(self.params, self.mesh, self.params_specs)
        return tp_model_forward(
            self.config, self.mesh, self.params_specs, base_forward=self.forward
        )

    def _new_cache(self):
        return self.init_cache(self.config, self.batch_size, self.max_len)

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int = 32,
        eos_id: Optional[int] = None,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        rng: Optional[jax.Array] = None,
    ) -> list[list[int]]:
        """Greedy (or sampled) generation for a batch of token prompts."""
        b = self.batch_size
        if len(prompts) > b:
            raise ValueError(f"{len(prompts)} prompts > batch_size {b}")
        plen = max(len(p) for p in prompts)
        # bucket the prefill length to a power of two so the number of
        # compiled prefill shapes is O(log max_len), not O(prompt lengths);
        # skip bucketing when it would eat the generation headroom
        bucket = 16
        while bucket < plen:
            bucket *= 2
        if bucket + max_new_tokens <= self.max_len:
            plen = bucket
        # Left-pad: sequence i's real tokens occupy slots [plen-len_i, plen),
        # so every sequence's next token lands in slot plen with the correct
        # RoPE position (slot - offset).
        toks = np.full((b, plen), self.pad_id, np.int32)
        offsets = np.full((b,), plen, np.int32)
        for i, p in enumerate(prompts):
            toks[i, plen - len(p):] = p
            offsets[i] = plen - len(p)
        offsets_j = jnp.asarray(offsets)

        cache = self._new_cache()
        next_logits, cache = self._prefill(
            self.params, jnp.asarray(toks), cache, offsets_j
        )

        out = [list() for _ in range(b)]
        done = np.zeros((b,), bool)
        done[len(prompts):] = True
        pos = plen
        if rng is None:
            rng = jax.random.PRNGKey(0)
        for _ in range(max_new_tokens):
            if temperature > 0.0:
                rng, sub = jax.random.split(rng)
                nxt = sample_logits(
                    sub, next_logits, temperature, top_k=top_k, top_p=top_p
                )
            else:
                nxt = jnp.argmax(next_logits, axis=-1)
            nxt_np = np.asarray(nxt)
            for i in range(len(prompts)):
                if not done[i]:
                    t = int(nxt_np[i])
                    if eos_id is not None and t == eos_id:
                        done[i] = True
                    else:
                        out[i].append(t)
            if done.all() or pos >= self.max_len:
                break
            next_logits, cache = self._decode(
                self.params,
                nxt.astype(jnp.int32)[:, None],
                cache,
                jnp.int32(pos),
                offsets_j,
            )
            pos += 1
        return out[: len(prompts)]


def greedy_generate(
    params,
    config,
    prompts: Sequence[Sequence[int]],
    max_new_tokens: int = 32,
    *,
    forward: Callable = llama.forward,
    max_len: int = 1024,
    eos_id: Optional[int] = None,
) -> list[list[int]]:
    """One-shot convenience wrapper (role of the reference's generation
    smoke test, tests/vllm.py:100-145)."""
    eng = Engine(
        params=params,
        config=config,
        forward=forward,
        max_len=max_len,
        batch_size=len(prompts),
    )
    return eng.generate(prompts, max_new_tokens=max_new_tokens, eos_id=eos_id)


@functools.partial(
    jax.jit, static_argnames=("config", "forward", "steps"), donate_argnums=(4,)
)
def _fused_decode_loop(params, config, forward, first_tokens, cache, pos0, steps):
    def body(carry, _):
        toks, cache, pos = carry
        logits, cache = forward(params, config, toks, cache, pos)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        return (nxt, cache, pos + 1), nxt[:, 0]

    (_, cache, _), seq = jax.lax.scan(
        body, (first_tokens, cache, pos0), length=steps
    )
    return seq.T, cache  # [B, steps]


@functools.partial(jax.jit, static_argnames=("config", "forward"), donate_argnums=(4,))
def _fused_prefill(params, config, forward, prompt_tokens, cache):
    logits, cache = forward(params, config, prompt_tokens, cache, jnp.int32(0))
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    return first, cache


def greedy_generate_fused(
    params,
    config,
    prompt_tokens: jax.Array,  # [B, P] int32 (fully dense, no padding)
    max_new_tokens: int,
    *,
    forward: Callable = llama.forward,
    max_len: int = 1024,
    init_cache: Callable = llama.init_cache,
):
    """Entirely-on-device greedy generation: jitted prefill + lax.scan
    decode. Everything is compiled — an eager prefill costs seconds of
    per-op dispatch over remote-attached TPUs."""
    b, p = prompt_tokens.shape
    cache = init_cache(config, b, max_len)
    first, cache = _fused_prefill(params, config, forward, prompt_tokens, cache)
    seq, cache = _fused_decode_loop(
        params, config, forward, first, cache, jnp.int32(p), max_new_tokens - 1
    )
    return jnp.concatenate([first, seq], axis=1)
