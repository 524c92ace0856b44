"""Probe explicit kernel configs on given GEMM shapes (finer-grained than
tune_zoo: hand-picked candidate lists, repeated measurements to separate
config effects from tunnel noise).

Usage: python scripts/probe_configs.py --shape 28672,4096 --m 8 \
           --configs 2048:2048,4096:1024,2048:1024 --reps 3
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu import packing
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.kernel_config import KernelConfig, is_config_supported
from flute_tpu.utils.benchmark import bench_op

HBM = 819.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", type=str, required=True)  # N,K
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--group", type=int, default=64)
    p.add_argument("--configs", type=str, required=True)  # bn:bk,bn:bk,...
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--iters", type=int, default=0)
    args = p.parse_args()
    n, k = (int(x) for x in args.shape.split(","))
    m, bits, g = args.m, args.bits, args.group
    bm = max(16, m)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2**bits, size=(k, n), dtype=np.int32)
    planes = [jax.device_put(pp) for pp in packing.pack_np(codes, bits)]
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // g, n)), jnp.bfloat16)
    table = jnp.asarray(np.sort(rng.standard_normal(2**bits)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    nbytes = k * n * bits // 8 + (k // g) * n * 2 + x.size * 2 + m * n * 2

    wb = k * n * bits // 8
    iters = args.iters or min(4000, max(100, int(0.04 * 500e9 / wb)))

    for spec in args.configs.split(","):
        bn, bk = (int(v) for v in spec.split(":"))
        cfg = KernelConfig(block_m=bm, block_n=bn, block_k=bk)
        if not is_config_supported(cfg, m, n, k, bits, g):
            print(f"{spec}: unsupported", flush=True)
            continue
        try:
            f = jax.jit(lambda x_, c=cfg: lut_gemm.lut_qgemm(
                x_, planes, scales, table, num_bits=bits, config=c,
                interpret=False,
            ))
            f(x).block_until_ready()
            ts = [bench_op(f, x, iters=iters) for _ in range(args.reps)]
        except Exception as e:
            print(f"{spec}: FAIL {str(e)[:80]}", flush=True)
            continue
        best = min(ts)
        print(
            f"{spec}: " + " ".join(f"{t*1e6:7.1f}" for t in ts)
            + f" us  best {nbytes/best/1e9:6.1f} GB/s "
            f"({100*nbytes/best/1e9/HBM:4.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
