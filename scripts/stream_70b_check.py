"""70B-enablement check: stream-quantize a Llama-3.1-70B-SHAPED checkpoint
under a hard host-RSS budget, then load it under simulated 8-way TP
sharding (VERDICT r1 item 2's done-criterion).

Disk/time make a full 80-layer 70B impractical in CI, so this uses the
real 70B layer shapes (hidden 8192, intermediate 28672, 64 heads / 8 kv)
with --layers decoder layers (default 4). Peak RSS is dominated by the
*largest single projection group* regardless of layer count, so the
bounded-memory claim transfers to the full model: streaming residency is
O(one fused projection), not O(model).

Usage: python scripts/stream_70b_check.py [--layers 4] [--rss-budget-gb 12]
"""

import argparse
import dataclasses
import json
import os
import resource
import shutil
import tempfile

import numpy as np


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def write_70b_shaped_ckpt(path: str, layers: int, rng):
    from safetensors.numpy import save_file

    import ml_dtypes

    hidden, inter = 8192, 28672
    heads, kv_heads, head_dim = 64, 8, 128
    vocab = 8192  # shrunk embed (dense pass-through; not the claim under test)
    cfg = {
        "model_type": "llama",
        "vocab_size": vocab,
        "hidden_size": hidden,
        "intermediate_size": inter,
        "num_hidden_layers": layers,
        "num_attention_heads": heads,
        "num_key_value_heads": kv_heads,
        "head_dim": head_dim,
        "rms_norm_eps": 1e-5,
        "rope_theta": 500000.0,
        "rope_scaling": None,
        "tie_word_embeddings": False,
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)

    def t(shape):
        return rng.standard_normal(shape).astype(np.float32).astype(
            ml_dtypes.bfloat16
        )

    shapes = {
        "self_attn.q_proj.weight": (heads * head_dim, hidden),
        "self_attn.k_proj.weight": (kv_heads * head_dim, hidden),
        "self_attn.v_proj.weight": (kv_heads * head_dim, hidden),
        "self_attn.o_proj.weight": (hidden, heads * head_dim),
        "mlp.gate_proj.weight": (inter, hidden),
        "mlp.up_proj.weight": (inter, hidden),
        "mlp.down_proj.weight": (hidden, inter),
    }
    # one shard per layer: streaming never needs more than one shard open
    index = {"weight_map": {}}
    for li in range(layers):
        tensors = {
            f"model.layers.{li}.input_layernorm.weight": t((hidden,)),
            f"model.layers.{li}.post_attention_layernorm.weight": t((hidden,)),
        }
        for sub, shape in shapes.items():
            tensors[f"model.layers.{li}.{sub}"] = t(shape)
        fn = f"model-{li:05d}-of-{layers + 1:05d}.safetensors"
        save_file(tensors, os.path.join(path, fn))
        for name in tensors:
            index["weight_map"][name] = fn
        print(f"  wrote layer shard {li}", flush=True)
    head = {
        "model.embed_tokens.weight": t((vocab, hidden)),
        "model.norm.weight": t((hidden,)),
        "lm_head.weight": t((vocab, hidden)),
    }
    fn = f"model-{layers:05d}-of-{layers + 1:05d}.safetensors"
    save_file(head, os.path.join(path, fn))
    for name in head:
        index["weight_map"][name] = fn
    with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
        json.dump(index, f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--rss-budget-gb", type=float, default=12.0)
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    work = tempfile.mkdtemp(prefix="flute70b_")
    src = os.path.join(work, "hf")
    out = os.path.join(work, "quant")
    try:
        rng = np.random.default_rng(0)
        print(f"writing 70B-shaped checkpoint ({args.layers} layers)...",
              flush=True)
        write_70b_shaped_ckpt(src, args.layers, rng)
        print(f"RSS after write: {rss_gb():.2f} GB", flush=True)

        from flute_tpu.integrations import huggingface as hf

        stats = hf.quantize_hf_model_streaming(
            src, out, num_bits=4, group_size=64
        )
        peak = rss_gb()
        print(
            f"streaming quantize done: peak RSS {peak:.2f} GB "
            f"(budget {args.rss_budget_gb}), "
            f"buffered high-water {stats['buffered_high_water']}",
            flush=True,
        )
        assert peak < args.rss_budget_gb, (
            f"RSS {peak:.2f} GB exceeded budget {args.rss_budget_gb} GB"
        )
        assert stats["buffered_high_water"] <= 1  # unfused: flush-on-arrival

        # load under simulated 8-way TP sharding (tp=8 across kv heads)
        from flute_tpu import parallel
        from flute_tpu.integrations.huggingface import load_quantized_model

        params, config, _ = load_quantized_model(out)
        config = dataclasses.replace(config, num_layers=args.layers)
        mesh = parallel.make_mesh(tp=8, dp=1)
        parallel.validate_tp(params, config, tp=8)  # 70B's documented tp=8
        specs = parallel.llama_partition_specs(params)
        sharded = parallel.shard_params(params, mesh, specs)
        leaves = jax.tree.leaves(sharded)
        print(
            f"sharded {len(leaves)} leaves over mesh {dict(mesh.shape)}; "
            f"RSS {rss_gb():.2f} GB",
            flush=True,
        )
        total = sum(leaf.nbytes for leaf in leaves) / 1e9
        print(f"sharded param bytes: {total:.2f} GB", flush=True)
        print("STREAM-70B CHECK PASSED", flush=True)
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
