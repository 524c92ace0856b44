"""Command-line entry points (role of the reference CLI,
flute/integrations/base.py:370-388):

    python -m flute_tpu.integrations.cli quantize \
        --model-dir /path/to/hf-llama --output-dir /path/to/out \
        --num-bits 4 --group-size 64

    python -m flute_tpu.integrations.cli generate \
        --checkpoint /path/to/out --prompt "..." --max-new-tokens 64

    python -m flute_tpu.integrations.cli bench-kernel --m 8
"""

from __future__ import annotations

import argparse
import sys


def _cmd_quantize(args):
    if args.streaming:
        from flute_tpu.integrations.huggingface import (
            quantize_hf_model_streaming,
        )

        if args.fake:
            raise SystemExit("--fake is incompatible with --streaming")
        stats = quantize_hf_model_streaming(
            args.model_dir,
            args.output_dir,
            num_bits=args.num_bits,
            group_size=args.group_size,
            fuse=args.fuse,
            example_batch_size=args.example_batch_size,
        )
        print(
            f"quantized (streaming) {args.model_dir} -> {args.output_dir} "
            f"(peak buffered projections: {stats['buffered_high_water']})"
        )
        return
    from flute_tpu.integrations.huggingface import quantize_hf_model

    quantize_hf_model(
        args.model_dir,
        args.output_dir,
        num_bits=args.num_bits,
        group_size=args.group_size,
        fake=args.fake,
        example_batch_size=args.example_batch_size,
    )
    print(f"quantized {args.model_dir} -> {args.output_dir}")


def _cmd_import_flute(args):
    """Convert a reference-FLUTE (CUDA) checkpoint into a directly servable
    flute-tpu model checkpoint."""
    from flute_tpu.integrations.flute_format import (
        load_reference_checkpoint,
        reference_to_model_checkpoint,
    )

    if args.output_dir:
        n = reference_to_model_checkpoint(
            args.model_dir, args.output_dir,
            tile_p=args.tile_p, template_id=args.template_id,
        )
        print(
            f"converted {n} quantized layers from {args.model_dir} -> "
            f"{args.output_dir} (servable: cli generate/serve --checkpoint)"
        )
    else:
        out = load_reference_checkpoint(
            args.model_dir, tile_p=args.tile_p, template_id=args.template_id
        )
        n = sum(1 for v in out.values() if isinstance(v, dict) and "planes" in v)
        print(f"converted {n} quantized layers from {args.model_dir} (dry run)")


def _cmd_generate(args):
    from flute_tpu.integrations.huggingface import load_quantized_model, model_fns
    from flute_tpu.serving import Engine

    params, config, sidecar = load_quantized_model(
        args.checkpoint, batch_size=1, retune=args.retune
    )
    if config is None:
        raise SystemExit("checkpoint lacks config.json; cannot build model")
    fwd, init_cache = model_fns(
        (sidecar.get("model_config") or {}).get("model_type", "llama")
    )

    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.checkpoint)
        ids = tok(args.prompt)["input_ids"]
    except Exception:
        ids = [int(t) for t in args.prompt.split()]
        tok = None

    if getattr(args, "draft_checkpoint", None):
        # speculative decoding: the draft checkpoint (e.g. a W2
        # quantization of the same model) proposes, the target verifies
        from flute_tpu.serving import SpeculativeEngine

        dparams, dconfig, dsidecar = load_quantized_model(
            args.draft_checkpoint, batch_size=1, retune=args.retune
        )
        dfwd, dinit = model_fns(
            (dsidecar.get("model_config") or {}).get("model_type", "llama")
        )
        if dfwd is not fwd:
            raise SystemExit("draft and target model families must match")
        eng = SpeculativeEngine(
            target_params=params, target_config=config,
            draft_params=dparams, draft_config=dconfig,
            k=args.speculate_k, forward=fwd, init_cache=init_cache,
            max_len=args.max_len, batch_size=1,
        )
        sampling = None
        if args.temperature > 0:
            from flute_tpu.serving.continuous import SamplingParams

            sampling = SamplingParams(
                temperature=args.temperature, top_k=args.top_k,
                top_p=args.top_p, seed=args.seed,
            )
        out = eng.generate(
            [ids], max_new_tokens=args.max_new_tokens, sampling=sampling
        )
        print(
            f"# speculative: {eng.stats.rounds} rounds, "
            f"{eng.stats.acceptance_rate:.0%} acceptance, "
            f"{eng.stats.bonus} bonus tokens",
            file=sys.stderr,
        )
    else:
        eng = Engine(
            params=params, config=config, forward=fwd, init_cache=init_cache,
            max_len=args.max_len, batch_size=1,
        )
        import jax

        out = eng.generate(
            [ids], max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
            top_k=args.top_k or None,
            top_p=args.top_p if args.top_p < 1.0 else None,
            rng=jax.random.PRNGKey(args.seed),
        )
    if tok is not None:
        print(tok.decode(out[0]))
    else:
        print(out[0])


def _cmd_calibrate(args):
    """NFL: learn per-group scales on a token corpus, then quantize and
    save (role of the reference's learn_scales flow, learnable.py:75-156
    + prepare_model_flute custom-scales path)."""
    import numpy as np

    from flute_tpu.integrations import checkpoint as ckpt_io
    from flute_tpu.integrations.huggingface import (
        config_from_hf,
        load_hf_params,
        model_type_of,
    )
    from flute_tpu.quantize import learnable

    config = config_from_hf(args.model_dir)
    params = load_hf_params(args.model_dir, config)

    if args.tokens_npy:
        ids = np.load(args.tokens_npy).astype(np.int32).reshape(-1)
    else:
        from flute_tpu.eval import wikitext2_tokens

        ids = wikitext2_tokens(args.model_dir, split="train")
    n = args.batch_size * args.seq_len
    nb = min(args.steps, len(ids) // n)
    batches = [
        ids[i * n:(i + 1) * n].reshape(args.batch_size, args.seq_len)
        for i in range(nb)
    ]

    from flute_tpu.models import gemma2, llama

    fwd = gemma2.forward if model_type_of(args.model_dir) == "gemma2" else llama.forward
    trained = learnable.learn_scales(
        params, config, batches,
        num_bits=args.num_bits, group_size=args.group_size,
        learning_rate=args.lr, forward=fwd,
        callback=lambda i, l: print(f"step {i}: loss {l:.4f}", flush=True),
    )
    final = learnable.finalize_model(trained)
    ckpt_io.save_quantized(
        args.output_dir, final,
        model_config={"model_type": model_type_of(args.model_dir),
                      "source": args.model_dir, "nfl": True},
        num_bits=args.num_bits, group_size=args.group_size,
    )
    print(f"NFL-calibrated checkpoint written to {args.output_dir}")


def build_serve_engine(args):
    """Construct the serving engine + tokenizer for ``serve`` args (factored
    out of _cmd_serve so flag plumbing is testable without binding a port)."""
    from flute_tpu.integrations.huggingface import load_quantized_model, model_fns
    from flute_tpu.serving.continuous import ContinuousBatchingEngine

    params, config, sidecar = load_quantized_model(
        args.checkpoint, batch_size=args.num_slots, retune=args.retune
    )
    if config is None:
        raise SystemExit("checkpoint lacks config.json; cannot build model")
    fwd, init_cache = model_fns(
        (sidecar.get("model_config") or {}).get("model_type", "llama")
    )
    tok = None
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.checkpoint)
    except Exception:
        pass
    mesh = None
    if args.tp > 1:
        from flute_tpu.parallel import (
            make_mesh,
            permute_fused_params,
            validate_tp,
        )

        validate_tp(params, config, tp=args.tp)
        params = permute_fused_params(params, config, tp=args.tp)
        mesh = make_mesh(tp=args.tp, dp=1)
    if args.paged and args.draft_checkpoint:
        from flute_tpu.serving.paged_spec import PagedSpeculativeEngine

        dparams, dconfig, _ = load_quantized_model(
            args.draft_checkpoint, batch_size=args.num_slots,
            retune=args.retune,
        )
        if dconfig is None:
            raise SystemExit("draft checkpoint lacks config.json")
        if args.tp > 1:
            from flute_tpu.parallel import permute_fused_params, validate_tp

            validate_tp(dparams, dconfig, tp=args.tp)
            dparams = permute_fused_params(dparams, dconfig, tp=args.tp)
        eng = PagedSpeculativeEngine(
            params=params, config=config,
            draft_params=dparams, draft_config=dconfig,
            k=args.speculative_k,
            num_slots=args.num_slots, max_len=args.max_len,
            block_size=args.block_size, num_blocks=args.num_blocks,
            eos_id=getattr(tok, "eos_token_id", None),
            mesh=mesh,
            prefill_chunk=args.prefill_chunk,
            pool_prefill=args.pool_prefill,
        )
    elif args.draft_checkpoint:
        raise SystemExit("--draft-checkpoint on serve requires --paged")
    elif args.paged:
        from flute_tpu.serving.paged import PagedEngine

        eng = PagedEngine(
            params=params, config=config,
            forward=fwd, init_cache=init_cache,
            num_slots=args.num_slots, max_len=args.max_len,
            block_size=args.block_size, num_blocks=args.num_blocks,
            eos_id=getattr(tok, "eos_token_id", None),
            mesh=mesh,
            prefill_chunk=args.prefill_chunk,
            pool_prefill=args.pool_prefill,
        )
    else:
        eng = ContinuousBatchingEngine(
            params=params, config=config, forward=fwd, init_cache=init_cache,
            num_slots=args.num_slots, max_len=args.max_len,
            eos_id=getattr(tok, "eos_token_id", None),
            prefill_chunk=args.prefill_chunk,
            prefix_cache_entries=args.prefix_cache,
            prefix_block=args.prefix_block,
            mesh=mesh,
        )
    return eng, tok


def _cmd_serve(args):
    from flute_tpu.serving.server import serve

    eng, tok = build_serve_engine(args)
    srv = serve(eng, host=args.host, port=args.port, tokenizer=tok,
                model_id=args.checkpoint)
    print(f"serving on http://{args.host}:{srv.server_address[1]}/v1/completions")
    import time as _time

    try:
        while True:
            _time.sleep(3600)
    except KeyboardInterrupt:
        srv.shutdown()


def _cmd_bench_kernel(args):
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path("bench.py", run_name="__main__")


def build_parser():
    p = argparse.ArgumentParser(prog="flute_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("quantize", help="quantize an HF checkpoint")
    q.add_argument("--model-dir", required=True)
    q.add_argument("--output-dir", required=True)
    q.add_argument("--num-bits", type=int, default=4)
    q.add_argument("--group-size", type=int, default=64)
    q.add_argument("--fake", action="store_true")
    q.add_argument("--example-batch-size", type=int, default=8)
    q.add_argument("--streaming", action="store_true",
                   help="layer-streaming quantization with bounded host "
                        "memory (required for 70B+ checkpoints)")
    q.add_argument("--fuse", action="store_true",
                   help="fuse qkv / gate_up projections (streaming only)")
    q.set_defaults(fn=_cmd_quantize)

    g = sub.add_parser("generate", help="generate from a quantized checkpoint")
    g.add_argument("--checkpoint", required=True)
    g.add_argument("--prompt", required=True)
    g.add_argument("--max-new-tokens", type=int, default=64)
    g.add_argument("--max-len", type=int, default=2048)
    g.add_argument("--retune", action="store_true")
    g.add_argument("--draft-checkpoint", default=None,
                   help="enable speculative decoding with this quantized "
                        "draft checkpoint (same tokenizer/vocab; e.g. a W2 "
                        "quantization of the same model)")
    g.add_argument("--speculate-k", type=int, default=4,
                   help="draft proposals per verify round")
    g.add_argument("--temperature", type=float, default=0.0,
                   help="sampling temperature (0 = greedy); with "
                        "--draft-checkpoint this selects speculative "
                        "sampling (distribution-exact rejection verify)")
    g.add_argument("--top-k", type=int, default=0,
                   help="top-k filter (0 = off)")
    g.add_argument("--top-p", type=float, default=1.0,
                   help="nucleus filter (1.0 = off)")
    g.add_argument("--seed", type=int, default=0,
                   help="sampling seed (deterministic per seed)")
    g.set_defaults(fn=_cmd_generate)

    c = sub.add_parser("calibrate", help="NFL learned-scale calibration")
    c.add_argument("--model-dir", required=True)
    c.add_argument("--output-dir", required=True)
    c.add_argument("--num-bits", type=int, default=4)
    c.add_argument("--group-size", type=int, default=64)
    c.add_argument("--tokens-npy", default=None,
                   help=".npy of token ids (default: wikitext-2 via datasets)")
    c.add_argument("--steps", type=int, default=128)
    c.add_argument("--batch-size", type=int, default=2)
    c.add_argument("--seq-len", type=int, default=512)
    c.add_argument("--lr", type=float, default=1e-4)
    c.set_defaults(fn=_cmd_calibrate)

    s = sub.add_parser("serve", help="HTTP completion server (continuous batching)")
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--num-slots", type=int, default=8)
    s.add_argument("--max-len", type=int, default=2048)
    s.add_argument("--retune", action="store_true")
    s.add_argument("--prefill-chunk", type=int, default=None,
                   help="chunked prefill admission (bounds per-admission latency)")
    s.add_argument("--prefix-cache", type=int, default=0,
                   help="keep K/V of up to N recent prompt BLOCKS for "
                        "prefix reuse (LRU)")
    s.add_argument("--prefix-block", type=int, default=64,
                   help="prefix-cache block size in tokens")
    s.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways (devices on the mesh tp axis); "
                        "fused checkpoints are rank-major permuted on load")
    s.add_argument("--paged", action="store_true",
                   help="paged KV engine: block-pool memory, HBM cost "
                        "sum(len_i) instead of num_slots x max_len")
    s.add_argument("--block-size", type=int, default=16,
                   help="paged KV block size in tokens")
    s.add_argument("--num-blocks", type=int, default=512,
                   help="paged KV pool size in blocks")
    s.add_argument("--pool-prefill", action="store_true",
                   help="with --paged: prefill straight into pool blocks "
                        "via the fused multi-query kernel (no dense "
                        "scratch; admission memory bounded by one chunk)")
    s.add_argument("--draft-checkpoint", default=None,
                   help="with --paged: serve speculatively — this draft "
                        "checkpoint (same tokenizer/vocab; e.g. a W2 "
                        "quantization of the target) proposes tokens that "
                        "the target verifies in one paged forward")
    s.add_argument("--speculative-k", type=int, default=4,
                   help="draft proposals per verify round")
    s.set_defaults(fn=_cmd_serve)

    imp = sub.add_parser(
        "import-flute",
        help="convert a reference-FLUTE (CUDA) checkpoint to flute-tpu format",
    )
    imp.add_argument("--model-dir", required=True)
    imp.add_argument("--output-dir", default=None)
    imp.add_argument("--tile-p", type=int, default=None, choices=[32, 64])
    imp.add_argument("--template-id", type=int, default=None)
    imp.set_defaults(fn=_cmd_import_flute)

    b = sub.add_parser("bench-kernel", help="run the kernel benchmark")
    b.set_defaults(fn=_cmd_bench_kernel)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
