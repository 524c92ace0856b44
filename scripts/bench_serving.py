"""Serving-stack throughput on the real chip: paged decode, pool-backed
prefill, and speculative rounds on Llama-3.1-8B (random weights, REAL
shapes, built on-device — scripts/bench_model.py's builder; never upload
weights through the tunnel).

Measures, per section:
  * dense-cache fused greedy decode (the bench_model baseline number);
  * PagedEngine decode at the same batch (block-pool gather overhead vs
    the dense cache — vLLM parity cost on TPU);
  * pool-backed prefill admission latency vs the dense-scratch path;
  * PagedSpeculativeEngine rounds: self-draft (acceptance 1.0 — the
    k+1-tokens-per-round UPPER bound) and a W2 draft (real draft kernel
    cost; with random weights acceptance is near 0, so this is the
    LOWER bound — real checkpoints land in between; both bounds printed
    with their acceptance so nobody misreads one number).

NOTE timing: engine steps are host-driven loops (many dispatches), so
wall-clock through the tunnel includes ~2 ms/dispatch latency — numbers
here are conservative lower bounds on-chip (docs/BENCH_NOTES.md).

Usage:
  python -u scripts/bench_serving.py [--batch 8] [--steps 48]
      [--skip-spec] [--draft-bits 2]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_model import build_quantized_8b  # noqa: E402


def _bench_paged_decode(config, params, batch, steps, max_len):
    from flute_tpu.serving.paged import PagedEngine

    bs = 32
    eng = PagedEngine(
        params=params, config=config, num_slots=batch,
        block_size=bs, num_blocks=batch * (max_len // bs) + 8,
        max_len=max_len,
    )
    budget = steps + 8
    for i in range(batch):
        eng.submit(list(np.random.default_rng(i).integers(1, 1000, 16)),
                   max_new_tokens=budget)
    # warm: admissions + a few decode steps compile everything
    for _ in range(4):
        eng.step()
    t0 = time.time()
    for _ in range(steps):
        eng.step()
    jax.block_until_ready(eng._kp[0])
    dt = time.time() - t0
    toks = batch * steps
    print(f"paged decode: {toks} tokens in {dt:.3f}s -> "
          f"{toks / dt:.1f} tok/s/chip ({dt / steps * 1e3:.1f} ms/step)",
          flush=True)
    return toks / dt


def _bench_admission(config, params, plen, pool_prefill, chunk=None):
    from flute_tpu.serving.paged import PagedEngine

    bs = 32
    ml = -(-(plen + 128) // bs) * bs
    eng = PagedEngine(
        params=params, config=config, num_slots=1,
        block_size=bs, num_blocks=(plen + 256) // bs + 8, max_len=ml,
        pool_prefill=pool_prefill, prefill_chunk=chunk,
    )
    prompt = list(np.random.default_rng(0).integers(1, 1000, plen))
    eng.submit(prompt, max_new_tokens=4)
    t0 = time.time()
    eng.step()  # admission (prefill) + first decode
    jax.block_until_ready(eng._kp[0])
    warm = time.time() - t0
    eng.run()
    # second request: compiled path
    eng.submit(list(np.random.default_rng(1).integers(1, 1000, plen)),
               max_new_tokens=4)
    t0 = time.time()
    eng.step()
    jax.block_until_ready(eng._kp[0])
    dt = time.time() - t0
    mode = f"pool(chunk={chunk})" if pool_prefill else "scratch"
    print(f"admission plen={plen} [{mode}]: {dt * 1e3:.1f} ms "
          f"(first/compile {warm:.1f}s)", flush=True)
    return dt


def _bench_spec(config, params, dconfig, dparams, batch, steps, max_len, k,
                label):
    from flute_tpu.serving.paged_spec import PagedSpeculativeEngine

    bs = 32
    eng = PagedSpeculativeEngine(
        params=params, config=config,
        draft_params=dparams, draft_config=dconfig, k=k,
        num_slots=batch, block_size=bs,
        num_blocks=batch * (max_len // bs) + 8, max_len=max_len,
    )
    budget = (k + 1) * steps + 8
    for i in range(batch):
        eng.submit(list(np.random.default_rng(i).integers(1, 1000, 16)),
                   max_new_tokens=budget)
    for _ in range(3):
        eng.step()  # compile draft/verify/accept
    done0 = sum(len(v) for v in eng._out.values())
    t0 = time.time()
    for _ in range(steps):
        eng.step()
    jax.block_until_ready(eng._kp[0])
    dt = time.time() - t0
    toks = sum(len(v) for v in eng._out.values()) - done0
    print(f"speculative[{label}] k={k}: {toks} tokens in {dt:.3f}s -> "
          f"{toks / dt:.1f} tok/s/chip, acceptance "
          f"{eng.stats.acceptance_rate:.2f}, "
          f"{eng.stats.bonus}/{eng.stats.rounds} bonus rounds", flush=True)
    return toks / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=48)
    p.add_argument("--max-len", type=int, default=512)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--draft-bits", type=int, default=2)
    p.add_argument("--group", type=int, default=64)
    p.add_argument("--skip-spec", action="store_true")
    p.add_argument("--skip-admission", action="store_true")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.time()
    config, params = build_quantized_8b(args.bits, args.group, args.batch)
    jax.block_until_ready(params["embed"])
    print(f"8B W{args.bits} build: {time.time() - t0:.1f}s", flush=True)

    # dense fused baseline (same number bench_model prints)
    from flute_tpu.serving.engine import greedy_generate_fused

    prompts = jnp.asarray(
        np.random.default_rng(0).integers(1, 1000, (args.batch, 16)),
        jnp.int32,
    )
    out = greedy_generate_fused(params, config, prompts, 8,
                                max_len=args.max_len)
    jax.block_until_ready(out)
    t0 = time.time()
    out = greedy_generate_fused(params, config, prompts, args.steps,
                                max_len=args.max_len)
    jax.block_until_ready(out)
    dt = time.time() - t0
    dense = args.batch * args.steps / dt
    print(f"dense fused decode: {dense:.1f} tok/s/chip", flush=True)

    paged = _bench_paged_decode(config, params, args.batch, args.steps,
                                args.max_len)
    print(f"paged/dense ratio: {paged / dense:.2f}", flush=True)

    if not args.skip_admission:
        for plen in (512, 2048):
            _bench_admission(config, params, plen, pool_prefill=False)
            _bench_admission(config, params, plen, pool_prefill=True,
                             chunk=256)

    if not args.skip_spec:
        # UPPER bound: self-draft, acceptance 1.0 (k+1 tokens per round)
        _bench_spec(config, params, config, params, args.batch,
                    args.steps, args.max_len, args.k, "self-draft")
        # LOWER bound: W2 draft on random weights (acceptance ~0) — pays
        # the real draft kernel cost with no agreement
        t0 = time.time()
        dconfig, dparams = build_quantized_8b(
            args.draft_bits, args.group, args.batch
        )
        jax.block_until_ready(dparams["embed"])
        print(f"8B W{args.draft_bits} draft build: {time.time() - t0:.1f}s",
              flush=True)
        _bench_spec(config, params, dconfig, dparams, args.batch,
                    args.steps, args.max_len, args.k,
                    f"w{args.draft_bits}-draft")


if __name__ == "__main__":
    main()
