"""Quantized-checkpoint IO with a ``flute_config.json`` sidecar.

Role-equivalent of the reference's checkpoint story (SURVEY §5): HF
``save_pretrained`` weights + sidecar ``flute_config.json``
(``{version, num_bits, group_size}``, reference base.py:356-367) +
per-layer ``{num_bits, group_size, template_id}`` embedded via
``get/set_extra_state`` (base.py:310-326), with unpack→retune→repack on
load when the deployment changed (huggingface.py:173-236).

The TPU format: a directory of ``.npy`` tensors + a JSON manifest that
records the pytree structure and, for each :class:`QuantizedLinear` /
:class:`LearnableQuantizedLinear` node, its static metadata (the extra-state
analogue — ``config_key`` plays template_id). On load, configs are refitted
(never repacked — the layout is config-independent) and optionally retuned
via :func:`flute_tpu.tune.maybe_retune`.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu.nn import QuantizedLinear
from flute_tpu.version import __version__

_MANIFEST = "manifest.json"
_SIDECAR = "flute_config.json"


def _safe_name(path_str: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", path_str)


def _path_str(path) -> str:
    parts = []
    for e in path:
        if hasattr(e, "key"):
            parts.append(str(e.key))
        elif hasattr(e, "idx"):
            parts.append(str(e.idx))
        elif hasattr(e, "name"):
            parts.append(str(e.name))
        else:
            parts.append(str(e))
    return "/".join(parts)


def _is_node(x) -> bool:
    return isinstance(x, QuantizedLinear) or type(x).__name__ == "LearnableQuantizedLinear"


def save_quantized(
    path: str,
    params: Any,
    *,
    model_config: Optional[dict] = None,
    num_bits: Optional[int] = None,
    group_size: Optional[int] = None,
) -> None:
    """Serialize a params pytree (dense + quantized leaves) to ``path``."""
    os.makedirs(path, exist_ok=True)
    entries = []

    def visit(p, leaf):
        ps = _path_str(p)
        if isinstance(leaf, QuantizedLinear):
            tensors = {}
            for i, pl in enumerate(leaf.planes):
                tensors[f"planes.{i}"] = _store(path, f"{ps}.planes.{i}", pl)
            tensors["scales"] = _store(path, f"{ps}.scales", leaf.scales)
            tensors["table"] = _store(path, f"{ps}.table", leaf.table)
            if leaf.pair_values is not None:
                tensors["pair_values"] = _store(path, f"{ps}.pair_values", leaf.pair_values)
            if leaf.bias is not None:
                tensors["bias"] = _store(path, f"{ps}.bias", leaf.bias)
            entries.append(
                {
                    "path": ps,
                    "type": "quantized_linear",
                    "num_bits": leaf.num_bits,
                    "group_size": leaf.group_size,
                    "config_key": leaf.config_key,
                    "hadamard_size": leaf.hadamard_size,
                    "layout": getattr(leaf, "layout", "auto"),
                    "tensors": tensors,
                }
            )
        elif leaf is None:
            entries.append({"path": ps, "type": "none"})
        else:
            entries.append(
                {
                    "path": ps,
                    "type": "array",
                    "tensors": {"value": _store(path, ps, leaf)},
                }
            )
        return None

    jax.tree_util.tree_map_with_path(visit, params, is_leaf=_is_node)
    manifest = {"version": __version__, "entries": entries}
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    sidecar = {
        "version": __version__,
        "num_bits": num_bits,
        "group_size": group_size,
        "model_config": model_config,
    }
    with open(os.path.join(path, _SIDECAR), "w") as f:
        json.dump(sidecar, f, indent=1)


class StreamingWriter:
    """Incremental writer producing the same on-disk format as
    :func:`save_quantized`, for bounded-host-memory quantization of
    checkpoints that never fit in RAM as a full pytree (the 70B/405B path;
    VERDICT r1 item 2). Tensors are flushed to disk as they are added."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self.entries: list[dict] = []

    def add_array(self, tree_path: str, arr) -> None:
        self.entries.append(
            {
                "path": tree_path,
                "type": "array",
                "tensors": {"value": _store(self.path, tree_path, arr)},
            }
        )

    def add_none(self, tree_path: str) -> None:
        self.entries.append({"path": tree_path, "type": "none"})

    def add_quantized(
        self,
        tree_path: str,
        planes,
        scales,
        table,
        *,
        num_bits: int,
        group_size: int,
        config_key: Optional[str] = None,
        bias=None,
        layout: str = "auto",
    ) -> None:
        tensors = {}
        for i, pl in enumerate(planes):
            tensors[f"planes.{i}"] = _store(
                self.path, f"{tree_path}.planes.{i}", pl
            )
        tensors["scales"] = _store(self.path, f"{tree_path}.scales", scales)
        tensors["table"] = _store(self.path, f"{tree_path}.table", table)
        if bias is not None:
            tensors["bias"] = _store(self.path, f"{tree_path}.bias", bias)
        self.entries.append(
            {
                "path": tree_path,
                "type": "quantized_linear",
                "num_bits": num_bits,
                "group_size": group_size,
                "config_key": config_key,
                "hadamard_size": None,
                "layout": layout,
                "tensors": tensors,
            }
        )

    def finish(
        self,
        *,
        model_config: Optional[dict] = None,
        num_bits: Optional[int] = None,
        group_size: Optional[int] = None,
    ) -> None:
        manifest = {"version": __version__, "entries": self.entries}
        with open(os.path.join(self.path, _MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)
        sidecar = {
            "version": __version__,
            "num_bits": num_bits,
            "group_size": group_size,
            "model_config": model_config,
        }
        with open(os.path.join(self.path, _SIDECAR), "w") as f:
            json.dump(sidecar, f, indent=1)


def _store(root: str, key: str, arr) -> str:
    fname = _safe_name(key) + ".npy"
    a = np.asarray(arr)
    if a.dtype == jnp.bfloat16:
        np.save(os.path.join(root, fname), a.view(np.uint16))
        return fname + "#bf16"
    np.save(os.path.join(root, fname), a)
    return fname


def _load_arr(root: str, ref: str) -> jnp.ndarray:
    if ref.endswith("#bf16"):
        a = np.load(os.path.join(root, ref[: -len("#bf16")]))
        return jax.lax.bitcast_convert_type(jnp.asarray(a), jnp.bfloat16)
    return jnp.asarray(np.load(os.path.join(root, ref)))


def load_quantized(path: str) -> tuple[Any, dict]:
    """Load a quantized checkpoint; returns (params pytree, sidecar dict)."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    with open(os.path.join(path, _SIDECAR)) as f:
        sidecar = json.load(f)

    tree: dict = {}
    for e in manifest["entries"]:
        parts = e["path"].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        key = parts[-1]
        if e["type"] == "none":
            node[key] = None
        elif e["type"] == "array":
            node[key] = _load_arr(path, e["tensors"]["value"])
        else:
            planes = []
            i = 0
            while f"planes.{i}" in e["tensors"]:
                planes.append(_load_arr(path, e["tensors"][f"planes.{i}"]))
                i += 1
            node[key] = QuantizedLinear(
                planes=tuple(planes),
                scales=_load_arr(path, e["tensors"]["scales"]),
                table=_load_arr(path, e["tensors"]["table"]),
                pair_values=(
                    _load_arr(path, e["tensors"]["pair_values"])
                    if "pair_values" in e["tensors"]
                    else None
                ),
                bias=(
                    _load_arr(path, e["tensors"]["bias"])
                    if "bias" in e["tensors"]
                    else None
                ),
                num_bits=e["num_bits"],
                group_size=e["group_size"],
                config_key=e.get("config_key"),
                hadamard_size=e.get("hadamard_size"),
                # pre-r4 checkpoints predate the w4sym layout: "auto"
                layout=e.get("layout", "auto"),
            )

    params = _listify(tree)
    return params, sidecar


def _listify(node):
    """Convert dicts with contiguous integer keys back into lists."""
    if isinstance(node, dict):
        conv = {k: _listify(v) for k, v in node.items()}
        if conv and all(re.fullmatch(r"\d+", k) for k in conv):
            idx = sorted(conv, key=int)
            if [int(i) for i in idx] == list(range(len(idx))):
                return [conv[i] for i in idx]
        return conv
    return node
