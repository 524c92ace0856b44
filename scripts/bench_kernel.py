"""Microbenchmark the LUT-GEMM kernel on real TPU hardware.

Usage: python scripts/bench_kernel.py [--m 16] [--bits 4] ...
Reports latency, effective weight bandwidth, and % of HBM roofline.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu import packing
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.kernel_config import KernelConfig
from flute_tpu.quantize import nf

# v5e (TPU v5 lite): ~819 GB/s HBM, 197 TFLOP/s bf16.
HBM_GBPS = 819.0


def bench_one(m, n, k, bits, group_size, config, iters=50, warmup=5):
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 2 ** bits, size=(k, n), dtype=np.int32))
    planes = packing.pack(codes, bits)
    planes = [jax.device_put(p) for p in planes]
    scales = jnp.asarray(
        rng.uniform(0.5, 1.5, size=(k // group_size, n)), dtype=jnp.bfloat16
    )
    table = nf.nf_values(bits)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)

    f = jax.jit(
        lambda x_, pl_, s_, t_: lut_gemm.lut_qgemm(
            x_, pl_, s_, t_, num_bits=bits, config=config, interpret=False
        )
    )
    y = f(x, planes, scales, table)
    y.block_until_ready()
    for _ in range(warmup):
        y = f(x, planes, scales, table)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x, planes, scales, table)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    weight_bytes = sum(p.size * 4 for p in planes)
    scale_bytes = scales.size * 2
    total_bytes = weight_bytes + scale_bytes + x.size * 2 + y.size * 2
    bw = total_bytes / dt / 1e9
    pct = 100.0 * bw / HBM_GBPS
    flops = 2 * m * n * k / dt / 1e12
    return dt, bw, pct, flops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--n", type=int, default=14336)
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--group-size", type=int, default=64)
    p.add_argument("--block-m", type=int, default=None)
    p.add_argument("--block-n", type=int, default=None)
    p.add_argument("--block-k", type=int, default=None)
    p.add_argument("--lut-mode", type=str, default="gather")
    p.add_argument("--sweep", action="store_true")
    args = p.parse_args()

    print(f"devices: {jax.devices()}")

    if args.sweep:
        best = None
        for bn in (512, 1024, 2048):
            for bk in (512, 1024, 2048):
                if args.n % bn or args.k % bk:
                    continue
                cfg = KernelConfig(
                    block_m=max(16, args.m), block_n=bn, block_k=bk,
                    lut_mode=args.lut_mode,
                )
                try:
                    dt, bw, pct, tf = bench_one(
                        args.m, args.n, args.k, args.bits, args.group_size, cfg
                    )
                except Exception as e:
                    print(f"  {cfg.key()}: FAIL {type(e).__name__}: {str(e)[:120]}")
                    continue
                print(
                    f"  {cfg.key()}: {dt*1e6:8.1f} us  {bw:7.1f} GB/s "
                    f"({pct:5.1f}% roofline)  {tf:6.2f} TFLOP/s"
                )
                if best is None or dt < best[1]:
                    best = (cfg, dt, bw, pct)
        if best:
            print(f"BEST: {best[0].key()} -> {best[1]*1e6:.1f} us, {best[3]:.1f}%")
    else:
        bm = args.block_m or max(16, args.m)
        cfg = KernelConfig(
            block_m=bm,
            block_n=args.block_n or 1024,
            block_k=args.block_k or 1024,
            lut_mode=args.lut_mode,
        )
        dt, bw, pct, tf = bench_one(
            args.m, args.n, args.k, args.bits, args.group_size, cfg
        )
        print(
            f"M={args.m} N={args.n} K={args.k} W{args.bits}G{args.group_size} "
            f"{cfg.key()}: {dt*1e6:.1f} us  {bw:.1f} GB/s ({pct:.1f}% of "
            f"{HBM_GBPS} GB/s)  {tf:.2f} TFLOP/s"
        )


if __name__ == "__main__":
    main()
