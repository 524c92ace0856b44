"""NFL — learned-scale quantization calibration (pure JAX + optax).

Role-equivalent of the reference's ``flute/integrations/learnable.py``:
``LearnableQuantizedLinear`` (learnable.py:13-66) holds a frozen weight and
*trainable per-group scales*; its forward is straight-through-estimator
fake quantization followed by the dense matmul. ``learn_scales``
(learnable.py:75-156) optimizes only the scales against a causal-LM loss.

The JAX redesign:
  * the layer is a registered-dataclass pytree whose only trainable leaf is
    ``scales``; the STE is ``jax.lax.stop_gradient`` on the code assignment
    (gradient w.r.t. scales flows through ``table[codes] * scales``);
  * the trainer is a jitted optax step, data-parallel over the calibration
    batch and tensor-parallel over layers when run under a mesh — strictly
    more parallel than the reference's single-GPU Adam loop;
  * tensors live in the *kernel* orientation ([K, N] weights,
    [K/g, N] scales) so ``finalize`` packs without re-transposition.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu.quantize import nf


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LearnableQuantizedLinear:
    """Fake-quantized linear with trainable per-group scales.

    ``weight``: frozen dense ``[K, N]`` (in, out). ``scales``: trainable
    ``[K // group_size, N]``, initialized to group absmax. ``table``:
    ``[2^b]`` ascending float32.
    """

    weight: jax.Array
    scales: jax.Array
    table: jax.Array
    bias: Optional[jax.Array] = None
    num_bits: int = _field(default=4, metadata=dict(static=True))
    group_size: int = _field(default=64, metadata=dict(static=True))

    def fake_quantized_weight(self, dtype=None) -> jax.Array:
        """STE fake-quant of the frozen weight: codes are assigned with
        gradients stopped; the value is ``table[codes] * scales`` so
        d/d(scales) = table[codes] (reference learnable.py:40-57)."""
        dtype = dtype or self.weight.dtype
        k, n = self.weight.shape
        g = self.group_size
        w = jax.lax.stop_gradient(self.weight.astype(jnp.float32))
        wg = w.reshape(k // g, g, n)
        s = self.scales.astype(jnp.float32)[:, None, :]
        s_safe = jnp.where(s == 0, 1.0, s)
        pivots = nf.nf_pivots(self.table.astype(jnp.float32))
        codes = jnp.searchsorted(pivots, wg / s_safe, side="left")
        codes = jax.lax.stop_gradient(codes)
        vals = self.table.astype(dtype)[codes]
        deq = vals * s.astype(dtype)
        return deq.reshape(k, n).astype(dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        w_fq = self.fake_quantized_weight(x.dtype)
        y = jnp.dot(x, w_fq, preferred_element_type=jnp.float32).astype(x.dtype)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y


def make_learnable(
    weight_in_out: jax.Array,
    num_bits: int = 4,
    group_size: int = 64,
    symmetric: Optional[bool] = None,
) -> LearnableQuantizedLinear:
    """Wrap a dense ``[in, out]`` weight with absmax-initialized learnable
    scales (reference init, learnable.py:27-35).

    ``symmetric`` (default True for 4-bit) trains against the ascending
    sign-symmetric NF grid so ``finalize`` lands on the w4sym fast layout
    (quantize_linear recognizes ascending-symmetric tables)."""
    w = jnp.asarray(weight_in_out, jnp.float32)
    k, n = w.shape
    if symmetric is None:
        symmetric = num_bits == 4
    if symmetric:
        if num_bits != 4:
            raise ValueError("symmetric NF requires num_bits=4")
        table = jnp.asarray(nf.nf_values_symmetric_exact(num_bits))
    else:
        table = nf.nf_values(num_bits, symmetric=False)
    absmax = jnp.max(jnp.abs(w.reshape(k // group_size, group_size, n)), axis=1)
    return LearnableQuantizedLinear(
        weight=w,
        scales=absmax,
        table=table,
        num_bits=num_bits,
        group_size=group_size,
    )


def finalize(layer: LearnableQuantizedLinear, **quant_kwargs):
    """Quantize the frozen weight with the learned scales into a real
    :class:`flute_tpu.nn.QuantizedLinear` (role of prepare_model_flute's
    custom-scales path, reference base.py:127-138)."""
    from flute_tpu.nn import quantize_linear

    return quantize_linear(
        layer.weight.T,  # [out, in]
        layer.num_bits,
        layer.group_size,
        custom_scales=layer.scales.T,  # [N, K/g]
        table=layer.table,
        bias=layer.bias,
        **quant_kwargs,
    )


# ---------------------------------------------------------------------------
# Model-level calibration (role of reference learn_scales, learnable.py:75-156)
# ---------------------------------------------------------------------------

# Layer types the reference calibrates (learnable.py:86): the seven
# projection matrices of each transformer block.
PROJ_KEYS = ("q", "k", "v", "o", "gate", "up", "down")


def make_model_learnable(params: dict, num_bits: int, group_size: int) -> dict:
    """Swap every projection leaf of a Llama-layout params pytree for a
    :class:`LearnableQuantizedLinear`."""
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new_layer = dict(layer)
        for key in PROJ_KEYS:
            w = layer[key]
            if isinstance(w, LearnableQuantizedLinear):
                new_layer[key] = w
                continue
            new_layer[key] = make_learnable(jnp.asarray(w), num_bits, group_size)
        out["layers"].append(new_layer)
    return out


def finalize_model(params: dict, **quant_kwargs) -> dict:
    """Convert every LearnableQuantizedLinear back to a packed
    QuantizedLinear with its learned scales."""
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new_layer = dict(layer)
        for key, v in layer.items():
            if isinstance(v, LearnableQuantizedLinear):
                new_layer[key] = finalize(v, **quant_kwargs)
        out["layers"].append(new_layer)
    return out


def split_scales(params: dict) -> tuple[dict, dict]:
    """Partition a learnable params pytree into (trainable scales pytree,
    static remainder). Rejoin with :func:`merge_scales`."""
    scales = {}
    for li, layer in enumerate(params["layers"]):
        for key, v in layer.items():
            if isinstance(v, LearnableQuantizedLinear):
                scales[f"{li}/{key}"] = v.scales
    return scales, params


def merge_scales(scales: dict, params: dict) -> dict:
    out = dict(params)
    out["layers"] = []
    for li, layer in enumerate(params["layers"]):
        new_layer = dict(layer)
        for key, v in layer.items():
            sk = f"{li}/{key}"
            if sk in scales:
                new_layer[key] = dataclasses.replace(v, scales=scales[sk])
        out["layers"].append(new_layer)
    return out


def clm_loss(params: dict, config, tokens: jax.Array, forward: Callable) -> jax.Array:
    """Next-token cross-entropy over a [B, T] batch (the reference's
    calibration objective, learnable.py:118-137)."""
    from flute_tpu.models import llama

    b, t = tokens.shape
    cache = llama.init_cache(config, b, t, dtype=config.dtype)
    logits, _ = forward(params, config, tokens[:, :-1], cache, jnp.int32(0))
    logits = logits[:, :, :]  # [B, T-1, V]
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def learn_scales(
    params: dict,
    config,
    batches: Iterable[np.ndarray],
    *,
    num_bits: int = 4,
    group_size: int = 64,
    learning_rate: float = 1e-4,
    forward: Optional[Callable] = None,
    callback: Optional[Callable[[int, float], None]] = None,
) -> dict:
    """Optimize per-group scales against the CLM loss; returns a params
    pytree with updated LearnableQuantizedLinear scales.

    The reference trains with Adam on scales only (learnable.py:100-156);
    here the whole step is one jitted function — run it under a Mesh with
    sharded params/batches for dp+tp calibration.
    """
    import optax

    from flute_tpu.models import llama

    fwd = forward or llama.forward
    lparams = make_model_learnable(params, num_bits, group_size)
    scales, rest = split_scales(lparams)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(scales)

    @jax.jit
    def step(scales, opt_state, tokens):
        def loss_fn(s):
            return clm_loss(merge_scales(s, rest), config, tokens, fwd)

        loss, grads = jax.value_and_grad(loss_fn)(scales)
        updates, opt_state = opt.update(grads, opt_state)
        scales = optax.apply_updates(scales, updates)
        return scales, opt_state, loss

    for i, batch in enumerate(batches):
        scales, opt_state, loss = step(scales, opt_state, jnp.asarray(batch))
        if callback is not None:
            callback(i, float(loss))
    return merge_scales(scales, rest)
