"""Quantized module layer: ``QuantizedLinear`` and the model-quantization
walker.

Role-equivalent of the reference's ``flute/integrations/base.py``:
``FluteLinear`` (base.py:203-326) becomes a registered-dataclass *pytree* —
the idiomatic JAX module: its tensor leaves (packed planes, scales, table,
bias) flow through jit/pjit/shard_map and can carry
``jax.sharding.PartitionSpec``s, while quantization metadata (num_bits,
group_size, kernel-config key) rides along as static aux data, playing the
role of the reference's ``get/set_extra_state`` template_id persistence
(base.py:310-326).

``quantize_linear`` / ``quantize_params`` are the params-pytree walk that
replaces the reference's recursive ``nn.Module`` surgery
(``prepare_model_flute``, base.py:45-200): in JAX there is no module tree to
mutate — we transform a pytree of dense ``[out, in]`` weights into a pytree
whose linear leaves are ``QuantizedLinear`` nodes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu import packing
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.kernel_config import KernelConfig, get_kernel_config
from flute_tpu.quantize import nf


def _field(**kw):
    return dataclasses.field(**kw)


def _pack_auto(
    codes_kn: jax.Array,
    num_bits: int,
    chunk: int,
    wide: bool = False,
    layout: str = "plane",
):
    """Pack on the device the codes live on: accelerator-resident codes use
    the jnp packer (device->host round trips through a remote TPU tunnel
    are minutes for large models); host codes use the native/numpy packer."""
    platforms = {d.platform for d in codes_kn.devices()} if hasattr(
        codes_kn, "devices"
    ) else {"cpu"}
    if platforms - {"cpu"}:
        if layout == "w4sym":
            return packing.pack_w4_sym_jnp(codes_kn, chunk=chunk)
        if wide:
            return packing.pack_w3_wide_jnp(codes_kn, chunk=chunk)
        return packing.pack_jnp(codes_kn, num_bits, chunk=chunk)
    if layout == "w4sym":
        return [
            jnp.asarray(p)
            for p in packing.pack_w4_sym_np(np.asarray(codes_kn), chunk=chunk)
        ]
    return packing.pack(codes_kn, num_bits, chunk=chunk, wide=wide)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedLinear:
    """A LUT-quantized linear layer: ``y = x @ dequant(W) + bias``.

    Tensor contract (matches :func:`flute_tpu.ops.lut_gemm.lut_qgemm`):
      * ``planes``: packed int32 planes, shapes per
        :class:`flute_tpu.packing.PackFormat` for logical codes ``[K, N]``
        (K = in_features, N = out_features);
      * ``scales``: ``[K // group_size, N]`` in the compute dtype;
      * ``table``: ``[2^num_bits]`` float32 lookup values;
      * ``pair_values``: optional ``[2^b, 2^b, 2]`` joint pair table
        (HIGGS vector dequantization);
      * ``bias``: optional ``[N]``.

    Static metadata mirrors the reference's persisted
    ``{num_bits, group_size, template_id}`` extra-state (reference:
    flute/integrations/base.py:310-326) with ``config_key`` in the role of
    ``template_id``.
    """

    planes: tuple[jax.Array, ...]
    scales: jax.Array
    table: jax.Array
    pair_values: Optional[jax.Array] = None
    bias: Optional[jax.Array] = None
    num_bits: int = _field(default=4, metadata=dict(static=True))
    group_size: int = _field(default=64, metadata=dict(static=True))
    config_key: Optional[str] = _field(default=None, metadata=dict(static=True))
    # HIGGS checkpoints rotate activations before the GEMM (reference
    # qgemm_hadamard, flute/__init__.py:32-50); None = no rotation.
    hadamard_size: Optional[int] = _field(default=None, metadata=dict(static=True))
    # Packed-weight layout: "auto" (wide 3-bit detected by plane shape,
    # standard planes otherwise) or "w4sym" (sign-symmetric 4-bit fast
    # path — same plane shape as classic W4, so it must ride as metadata).
    layout: str = _field(default="auto", metadata=dict(static=True))

    @property
    def in_features(self) -> int:
        return self.scales.shape[0] * self.group_size

    @property
    def out_features(self) -> int:
        return self.scales.shape[1]

    @property
    def config(self) -> Optional[KernelConfig]:
        if self.config_key is None:
            return None
        return KernelConfig.from_key(self.config_key)

    def with_config(self, config: Optional[KernelConfig]) -> "QuantizedLinear":
        return dataclasses.replace(
            self, config_key=None if config is None else config.key()
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.hadamard_size is not None:
            from flute_tpu.ops.hadamard import grouped_hadamard_transform

            x = grouped_hadamard_transform(x, self.hadamard_size)
        y = lut_gemm.lut_qgemm(
            x,
            list(self.planes),
            self.scales,
            self.table,
            num_bits=self.num_bits,
            config=self.config,
            pair_values=self.pair_values,
            layout=self.layout,
        )
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        """Materialize the dense ``[in, out]`` weight (for tests/debug)."""
        if self.layout == "w4sym":
            codes = jnp.asarray(
                packing.unpack_w4_sym_np(np.asarray(self.planes[0]))
            )
        else:
            codes = packing.unpack(list(self.planes), self.num_bits)
        if self.pair_values is not None:
            return lut_gemm.dequantize_codes_pair(
                codes, self.scales, self.pair_values, dtype
            )
        return lut_gemm.dequantize_codes(codes, self.scales, self.table, dtype)


def quantize_linear(
    weight: jax.Array | np.ndarray,
    num_bits: int = 4,
    group_size: int = 64,
    *,
    bias: Optional[jax.Array] = None,
    dtype=jnp.bfloat16,
    custom_scales: Optional[jax.Array] = None,
    table: Optional[jax.Array] = None,
    example_batch_size: int = 8,
    config: Optional[KernelConfig] = None,
    chunk: int = packing.DEFAULT_CHUNK,
    wide: Optional[bool] = None,
    symmetric: Optional[bool] = None,
) -> QuantizedLinear:
    """NF-quantize a dense ``[out, in]`` weight into a :class:`QuantizedLinear`.

    The single-layer unit of the reference's ``prepare_model_flute``
    (flute/integrations/base.py:117-188): quantize (NF by default, or a
    caller-provided table, e.g. learned-NFL scales via ``custom_scales``),
    transpose to kernel orientation, pack, and attach a kernel config chosen
    for the expected decode batch size.

    ``symmetric``: quantize against the sign-symmetric NF grid and pack the
    w4sym fast layout (4-bit only; ~1.3-1.4x decode throughput on v5e —
    docs/KERNEL_NOTES.md). Default: True for 4-bit when no explicit table
    was supplied (the production path), False otherwise. A supplied
    ``table`` is used as-is: if it satisfies the sign-symmetric contract in
    sign-magnitude order (packing.is_symmetric_table) the w4sym layout is
    chosen automatically.
    """
    w = jnp.asarray(weight)
    n, k = w.shape
    if symmetric is None:
        symmetric = num_bits == 4 and table is None and chunk % 8 == 0
    layout = "auto"
    if table is None:
        if symmetric:
            if num_bits != 4:
                raise ValueError("symmetric NF quantization requires num_bits=4")
            _, codes, scales, table = nf.nf_quantize_symmetric(
                w, num_bits, group_size, custom_scales=custom_scales
            )
            layout = "w4sym"
        else:
            _, codes, scales, table = nf.nf_quantize(
                w, num_bits, group_size, custom_scales=custom_scales
            )
    else:
        table = jnp.asarray(table, jnp.float32)
        t_np = np.asarray(table)
        if num_bits == 4 and packing.is_symmetric_table(t_np, num_bits):
            # sign-magnitude-ordered symmetric table: quantize via the
            # ascending view, map codes back, pack the fast layout
            order = np.argsort(t_np)
            _, codes_sorted, scales = nf.quantize_with_table(
                w, table[jnp.asarray(order)], group_size, custom_scales
            )
            codes = jnp.asarray(order, jnp.int32)[codes_sorted]
            layout = "w4sym"
        elif num_bits == 4 and packing.is_ascending_symmetric_table(
            t_np, num_bits
        ):
            # ascending symmetric table (e.g. learnable/NFL grids):
            # reorder to sign-magnitude codes and take the fast layout
            table_sym, perm = packing.sym_code_order(t_np)
            _, codes_asc, scales = nf.quantize_with_table(
                w, table, group_size, custom_scales
            )
            codes = jnp.asarray(perm, jnp.int32)[codes_asc]
            table = jnp.asarray(table_sym)
            layout = "w4sym"
        else:
            _, codes, scales = nf.quantize_with_table(
                w, table, group_size, custom_scales
            )
    codes_kn = jnp.asarray(codes).T  # [K, N]
    # 3-bit defaults to the wide single-plane layout when the chunk allows
    # (measurably faster; docs/KERNEL_NOTES.md round 2) — pass wide=False
    # for the classic 2+1-plane layout
    if wide is None:
        wide = num_bits == 3 and chunk % 256 == 0
    elif wide and (num_bits != 3 or chunk % 256 != 0):
        raise ValueError("wide layout requires num_bits=3 and chunk % 256 == 0")
    planes = tuple(_pack_auto(codes_kn, num_bits, chunk, wide=wide, layout=layout))
    scales_kn = jnp.asarray(scales).T.astype(dtype)  # [K/g, N]
    if config is None:
        config = get_kernel_config(
            example_batch_size, n, k, num_bits, group_size, layout=layout
        )
    if config.chunk != chunk:
        config = dataclasses.replace(config, chunk=chunk)
    return QuantizedLinear(
        planes=planes,
        scales=scales_kn,
        table=jnp.asarray(table, jnp.float32),
        bias=None if bias is None else jnp.asarray(bias),
        num_bits=num_bits,
        group_size=group_size,
        config_key=config.key(),
        layout=layout,
    )


def from_codes(
    codes_kn: jax.Array | np.ndarray,
    scales_kn: jax.Array,
    table: Optional[jax.Array],
    num_bits: int,
    group_size: int,
    *,
    pair_values: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    config: Optional[KernelConfig] = None,
    example_batch_size: int = 8,
    chunk: int = packing.DEFAULT_CHUNK,
) -> QuantizedLinear:
    """Build a :class:`QuantizedLinear` from pre-computed ``[K, N]`` codes
    (the entry point for BNB/HIGGS/checkpoint importers)."""
    k, n = codes_kn.shape
    planes = tuple(_pack_auto(jnp.asarray(codes_kn), num_bits, chunk))
    if config is None:
        config = get_kernel_config(example_batch_size, n, k, num_bits, group_size)
    if config.chunk != chunk:
        config = dataclasses.replace(config, chunk=chunk)
    if table is None:
        table = jnp.zeros((2**num_bits,), jnp.float32)
    return QuantizedLinear(
        planes=planes,
        scales=scales_kn,
        table=jnp.asarray(table, jnp.float32),
        pair_values=pair_values,
        bias=bias,
        num_bits=num_bits,
        group_size=group_size,
        config_key=config.key(),
    )


def _is_linear_leaf(x: Any) -> bool:
    return isinstance(x, (jax.Array, np.ndarray)) and getattr(x, "ndim", 0) == 2


def quantize_params(
    params: Any,
    num_bits: int = 4,
    group_size: int = 64,
    *,
    dtype=jnp.bfloat16,
    predicate=None,
    example_batch_size: int = 8,
) -> Any:
    """Walk a params pytree, replacing 2-D ``[out, in]`` weight leaves with
    :class:`QuantizedLinear` nodes (role of reference
    ``prepare_model_flute``'s recursive module replacement,
    flute/integrations/base.py:45-200).

    ``predicate(path, leaf) -> bool`` selects which leaves to quantize;
    default = every 2-D leaf whose in-dim is divisible by ``group_size`` and
    by the pack chunk. Embeddings / norms (1-D) are untouched.
    """

    def default_predicate(path, leaf):
        if not _is_linear_leaf(leaf):
            return False
        k = leaf.shape[1]
        return k % group_size == 0 and k % packing.DEFAULT_CHUNK == 0

    pred = predicate or default_predicate

    def visit(path, leaf):
        if pred(path, leaf):
            return quantize_linear(
                leaf,
                num_bits,
                group_size,
                dtype=dtype,
                example_batch_size=example_batch_size,
            )
        return leaf

    return jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: isinstance(x, QuantizedLinear)
    )
