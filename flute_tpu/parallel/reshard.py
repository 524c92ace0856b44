"""Weight resharding & repacking under topology/format changes.

The reference must all-gather + unpack + re-shard + re-pack packed weights
whenever the TP size changes (flute/integrations/vllm_utils.py:228-326) and
unpack + re-tune + re-pack when batch size or SM count changes at load time
(flute/integrations/huggingface.py:173-236, flute/tune.py:534-591).

flute-tpu's pack layout is slice-transparent (see flute_tpu/parallel/tp.py
docstring), so *runtime* resharding is just a PartitionSpec. This module
covers what still genuinely requires data movement:

  * :func:`shard_linear` / :func:`merge_shards` — explicit host-side
    splitting of a packed layer into per-rank layers (checkpoint-level
    resharding, e.g. exporting a TP4 checkpoint), exact by slicing;
  * :func:`repack` — pack-format migration (chunk size / kernel-config
    change) via unpack → pack with a lossless round-trip assertion, the
    analogue of the reference's repack-on-load with its lossless-cast
    verification (vllm_utils.py:233-250).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from flute_tpu import packing
from flute_tpu.nn import QuantizedLinear
from flute_tpu.ops.kernel_config import KernelConfig


def _config_chunk(layer: QuantizedLinear) -> int:
    cfg = layer.config
    return cfg.chunk if cfg is not None else packing.DEFAULT_CHUNK


def shard_linear(
    layer: QuantizedLinear, num_shards: int, axis: str
) -> list[QuantizedLinear]:
    """Split a packed layer into ``num_shards`` along ``axis`` ("n" = out
    features, "k" = in features). Exact (no unpack) by layout design."""
    if axis == "n":
        n = layer.out_features
        if n % num_shards:
            raise ValueError(f"N={n} not divisible by {num_shards}")
        ln = n // num_shards
        out = []
        for r in range(num_shards):
            sl = slice(r * ln, (r + 1) * ln)
            out.append(
                dataclasses.replace(
                    layer,
                    planes=tuple(p[:, sl] for p in layer.planes),
                    scales=layer.scales[:, sl],
                    bias=None if layer.bias is None else layer.bias[sl],
                )
            )
        return out
    if axis == "k":
        k = layer.in_features
        chunk = _config_chunk(layer)
        lk = k // num_shards
        if k % num_shards or lk % chunk or lk % layer.group_size:
            raise ValueError(
                f"K={k} shards of {lk} must be multiples of chunk={chunk} "
                f"and group={layer.group_size}"
            )
        if layer.bias is not None:
            raise ValueError("bias on a K-sharded layer is unsupported")
        out = []
        for r in range(num_shards):
            frac = [p.shape[0] // num_shards for p in layer.planes]
            out.append(
                dataclasses.replace(
                    layer,
                    planes=tuple(
                        p[r * f:(r + 1) * f] for p, f in zip(layer.planes, frac)
                    ),
                    scales=layer.scales[
                        r * (lk // layer.group_size):(r + 1) * (lk // layer.group_size)
                    ],
                )
            )
        return out
    raise ValueError(f"axis must be 'n' or 'k', got {axis}")


def merge_shards(
    shards: Sequence[QuantizedLinear], axis: str
) -> QuantizedLinear:
    """Inverse of :func:`shard_linear` (the all-gather direction)."""
    first = shards[0]
    if axis == "n":
        return dataclasses.replace(
            first,
            planes=tuple(
                jnp.concatenate([s.planes[i] for s in shards], axis=1)
                for i in range(len(first.planes))
            ),
            scales=jnp.concatenate([s.scales for s in shards], axis=1),
            bias=None
            if first.bias is None
            else jnp.concatenate([s.bias for s in shards]),
        )
    if axis == "k":
        return dataclasses.replace(
            first,
            planes=tuple(
                jnp.concatenate([s.planes[i] for s in shards], axis=0)
                for i in range(len(first.planes))
            ),
            scales=jnp.concatenate([s.scales for s in shards], axis=0),
        )
    raise ValueError(f"axis must be 'n' or 'k', got {axis}")


def repack(
    layer: QuantizedLinear,
    *,
    new_config: KernelConfig | None = None,
    new_chunk: int | None = None,
    verify: bool = True,
) -> QuantizedLinear:
    """Migrate a layer to a different pack chunk / kernel config by
    unpack → pack, with a lossless round-trip check (reference pattern:
    vllm_utils.py:233-250 lossless-cast assertions)."""
    old_chunk = _config_chunk(layer)
    if new_config is not None and new_chunk is not None:
        if new_config.chunk != new_chunk:
            raise ValueError("new_config.chunk disagrees with new_chunk")
    chunk = (
        new_config.chunk
        if new_config is not None
        else (new_chunk if new_chunk is not None else old_chunk)
    )
    if getattr(layer, "layout", "auto") == "w4sym":
        codes = packing.unpack_w4_sym_np(
            np.asarray(layer.planes[0]), chunk=old_chunk
        )
        planes = packing.pack_w4_sym_np(codes, chunk=chunk)
        back = packing.unpack_w4_sym_np(planes[0], chunk=chunk) if verify else None
    else:
        codes = packing.unpack_np(
            [np.asarray(p) for p in layer.planes], layer.num_bits,
            chunk=old_chunk,
        )
        planes = packing.pack_np(codes, layer.num_bits, chunk=chunk)
        back = (
            packing.unpack_np(planes, layer.num_bits, chunk=chunk)
            if verify else None
        )
    if verify:
        if not np.array_equal(back, codes):
            raise AssertionError("repack round-trip is not lossless")
    cfg = new_config
    if cfg is None:
        old = layer.config
        if old is not None:
            cfg = dataclasses.replace(old, chunk=chunk)
    return dataclasses.replace(
        layer,
        planes=tuple(jnp.asarray(p) for p in planes),
        config_key=None if cfg is None else cfg.key(),
    )
