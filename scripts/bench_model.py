"""Full-model decode throughput: build Llama-3.1-8B (random weights,
REAL shapes) entirely on-device, NF-quantize + pack on-device (pack_jnp —
no tunnel uploads), and measure steady-state greedy decode tokens/s/chip.

Usage: python scripts/bench_model.py [--batch 8] [--steps 64] [--bits 4]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu import packing
from flute_tpu.models import llama
from flute_tpu.nn import QuantizedLinear
from flute_tpu.ops.kernel_config import get_kernel_config
from flute_tpu.quantize import nf


def build_quantized_8b(
    bits: int, group: int, batch_hint: int, fuse: bool = True,
    quantize_head: bool = False, symmetric: bool | None = None,
):
    """Layer-by-layer on-device random init + quantize + pack (dense weights
    never all live at once). 4-bit defaults to the sign-symmetric NF grid
    on the w4sym fast layout (the production path; --no-sym opts out)."""
    c = llama.LlamaConfig.llama31_8b()
    if symmetric is None:
        symmetric = bits == 4
    if symmetric:
        if bits != 4:
            raise ValueError("symmetric requires 4-bit")
        v_asc = nf.nf_values_symmetric_exact(4)
        table_sym_np, perm_np = packing.sym_code_order(v_asc)
        table = jnp.asarray(table_sym_np)       # sym (code) order
        quant_values = jnp.asarray(v_asc)       # ascending, for pivots
        perm = jnp.asarray(perm_np, jnp.int32)
        layout = "w4sym"
    else:
        table = nf.nf_values(bits)
        quant_values = table
        perm = None
        layout = "auto"
    key = jax.random.PRNGKey(0)

    @jax.jit
    def quantize_kn(w_kn):  # [K, N] dense -> codes [K, N], scales [K/g, N]
        k, n = w_kn.shape
        wg = w_kn.astype(jnp.float32).reshape(k // group, group, n)
        absmax = jnp.max(jnp.abs(wg), axis=1)
        absmax = jnp.where(absmax == 0, 1.0, absmax)
        pivots = nf.nf_pivots(quant_values)
        codes = jnp.searchsorted(pivots, wg / absmax[:, None, :], side="left")
        codes = codes.reshape(k, n).astype(jnp.int32)
        if perm is not None:
            codes = perm[codes]  # ascending -> sign-magnitude order
        return codes, absmax.astype(jnp.bfloat16)

    def qlin(key, k_in, n_out, n_chunk=32768):
        # chunk along N: eager quantize+pack intermediates are ~8x the
        # dense bytes; the lm_head (4096x131072) OOMs unchunked
        plane_parts, scale_parts = [], []
        for i, ofs in enumerate(range(0, n_out, n_chunk)):
            nc = min(n_chunk, n_out - ofs)
            sub = jax.random.fold_in(key, i)
            w = jax.random.normal(sub, (k_in, nc), jnp.bfloat16) * 0.02
            codes, scales = quantize_kn(w)
            del w
            if layout == "w4sym":
                # sign-symmetric fast layout (r4 production default)
                plane_parts.append(packing.pack_w4_sym_jnp(codes))
            elif bits == 3:
                # wide single-plane layout (r2 default; 69% roofline)
                plane_parts.append(packing.pack_w3_wide_jnp(codes))
            else:
                plane_parts.append(packing.pack_jnp(codes, bits))
            scale_parts.append(scales)
            del codes
        planes = tuple(
            jnp.concatenate([p[j] for p in plane_parts], axis=1)
            for j in range(len(plane_parts[0]))
        )
        scales = jnp.concatenate(scale_parts, axis=1)
        cfg = get_kernel_config(
            batch_hint, n_out, k_in, bits, group, layout=layout
        )
        return QuantizedLinear(
            planes=planes, scales=scales, table=table,
            num_bits=bits, group_size=group, config_key=cfg.key(),
            layout=layout,
        )

    qdim = c.num_heads * c.head_dim
    kvdim = c.num_kv_heads * c.head_dim
    layers = []
    for li in range(c.num_layers):
        key, *ks = jax.random.split(key, 5)
        layer = {
            "attn_norm": jnp.ones((c.hidden_size,), c.dtype),
            "mlp_norm": jnp.ones((c.hidden_size,), c.dtype),
            "o": qlin(ks[1], qdim, c.hidden_size),
            "down": qlin(ks[3], c.intermediate_size, c.hidden_size),
        }
        if fuse:
            layer["qkv"] = qlin(ks[0], c.hidden_size, qdim + 2 * kvdim)
            layer["gate_up"] = qlin(ks[2], c.hidden_size, 2 * c.intermediate_size)
        else:
            key, k1, k2, k3 = jax.random.split(key, 4)
            layer["q"] = qlin(ks[0], c.hidden_size, qdim)
            layer["k"] = qlin(k1, c.hidden_size, kvdim)
            layer["v"] = qlin(k2, c.hidden_size, kvdim)
            layer["gate"] = qlin(ks[2], c.hidden_size, c.intermediate_size)
            layer["up"] = qlin(k3, c.hidden_size, c.intermediate_size)
        layers.append(layer)
        if li % 8 == 0:
            jax.block_until_ready(layers[-1]["down"].planes)
            print(f"  built layer {li}/{c.num_layers}", flush=True)

    key, ek, hk = jax.random.split(key, 3)
    params = {
        "embed": jax.random.normal(ek, (c.vocab_size, c.hidden_size), c.dtype) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((c.hidden_size,), c.dtype),
        "lm_head": (
            # pad out-features to a 2048 multiple for good kernel blocks;
            # llama.forward slices logits back to vocab_size
            qlin(hk, c.hidden_size, c.vocab_size + (-c.vocab_size) % 2048)
            if quantize_head
            else jax.random.normal(hk, (c.hidden_size, c.vocab_size), c.dtype) * 0.02
        ),
    }
    return c, params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--batches", type=str, default=None,
                   help="comma list; sweeps batch sizes in one build")
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--group", type=int, default=64)
    p.add_argument("--prompt-len", type=int, default=16)
    p.add_argument("--max-len", type=int, default=256)
    p.add_argument("--max-lens", type=str, default=None,
                   help="comma list; sweeps context lengths in one build")
    p.add_argument("--quantize-head", action="store_true")
    p.add_argument("--no-sym", action="store_true",
                   help="general asymmetric-NF W4 instead of w4sym")
    args = p.parse_args()

    batches = ([int(b) for b in args.batches.split(",")]
               if args.batches else [args.batch])
    max_lens = ([int(s_) for s_ in args.max_lens.split(",")]
                if args.max_lens else [args.max_len])

    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.time()
    config, params = build_quantized_8b(
        args.bits, args.group, batches[0], quantize_head=args.quantize_head,
        symmetric=False if args.no_sym else None,
    )
    jax.block_until_ready(params["embed"])
    print(f"8B quantize+pack on-device: {time.time() - t0:.1f}s", flush=True)

    for b in batches:
        for ml in max_lens:
            _measure(args, config, params, b, ml)


def _measure(args, config, params, batch, max_len):
    from flute_tpu.serving.engine import greedy_generate_fused

    print(f"--- batch {batch}, max_len {max_len} ---", flush=True)
    prompts = jnp.asarray(
        np.random.default_rng(0).integers(1, 1000, (batch, args.prompt_len)),
        jnp.int32,
    )
    t0 = time.time()
    out = greedy_generate_fused(
        params, config, prompts, 8, max_len=max_len
    )
    jax.block_until_ready(out)
    print(f"compile+warmup: {time.time() - t0:.1f}s", flush=True)

    # per-step HBM traffic: packed weights + scales + dense embed row reads
    # (negligible) + dense lm_head
    c = config
    qdim, kvdim = c.num_heads * c.head_dim, c.num_kv_heads * c.head_dim
    per_layer_w = (
        c.hidden_size * (qdim + 2 * kvdim)
        + qdim * c.hidden_size
        + 2 * c.hidden_size * c.intermediate_size
        + c.intermediate_size * c.hidden_size
    )
    head_bytes = c.hidden_size * c.vocab_size * (
        (args.bits / 8 + 2 / args.group) if args.quantize_head else 2
    )
    step_bytes = (
        c.num_layers * per_layer_w * (args.bits / 8 + 2 / args.group) + head_bytes
    )
    best = None
    for trial in range(3):
        t0 = time.time()
        out = greedy_generate_fused(
            params, config, prompts, args.steps, max_len=max_len
        )
        jax.block_until_ready(out)
        dt = time.time() - t0
        toks = batch * args.steps
        step_ms = dt / args.steps * 1e3
        best = min(best or 1e9, dt)
        print(
            f"trial {trial}: {toks} tokens in {dt:.3f}s -> "
            f"{toks / dt:.1f} tok/s/chip ({step_ms:.1f} ms/step)",
            flush=True,
        )
    bw = step_bytes / (best / args.steps) / 1e9
    print(
        f"RESULT batch={batch} max_len={max_len}: "
        f"{batch * args.steps / best:.1f} tok/s/chip; "
        f"weight-read bandwidth {bw:.0f} GB/s ({100 * bw / 819:.1f}% of "
        f"819 GB/s roofline)",
        flush=True,
    )


if __name__ == "__main__":
    main()
