"""Round-5 kernel lab: the small-projection ramp (r3 verdict weak #1 /
next-round #2).

The bench stack's small projections (o 4096x4096, qkv 6144x4096) run
10-20 roofline points below the big shapes at the same width. This lab
separates the candidate causes at those exact shapes, per block config:

  * qgemm     — the real w4sym kernel (production path);
  * floor     — same pipeline, dequant replaced by repeat+bitcast
                (kernel_lab.floor_kernel): the DMA/pipeline bound incl.
                per-call ramp. qgemm ≈ floor  => the ramp is structural
                (pipeline fill + prologue/epilogue), not dequant work;
  * ideal     — bytes / 819 GB/s for reference.

Config axes swept: block_k incl. whole-K (single K step per stripe — no
K pipeline at all, the minimum-ramp extreme), block_n incl. whole-N, and
block_m 8 vs 16.

Usage: python scripts/kernel_lab5.py [--shapes o,qkv] [--iters 200]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu.ops import lut_gemm
from flute_tpu.ops.kernel_config import KernelConfig, is_config_supported
from flute_tpu.utils.benchmark import bench_op

import kernel_lab  # floor variant lives there
from kernel_lab4 import make_w4sym

HBM = 819e9

SHAPES = {
    "o": (4096, 4096),
    "qkv": (6144, 4096),
    "gate_up": (28672, 4096),
    "down": (4096, 14336),
}


def bytes_moved(m, n, k, g):
    return k * n // 2 + (k // g) * n * 2 + m * k * 2 + m * n * 2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", type=str, default="o,qkv")
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--g", type=int, default=64)
    p.add_argument("--iters", type=int, default=200)
    args = p.parse_args()
    m, g = args.m, args.g
    rng = np.random.default_rng(0)

    # Harness floor: bench_op's serialization tap (a 1-element gather off
    # the output + a carry update over x) costs real device time per
    # iteration. If this floor is µs-scale it inflates every small-shape
    # measurement — the o/qkv "ramp" may partly be measurement harness.
    xf = jnp.asarray(rng.standard_normal((args.m, 4096)), jnp.bfloat16)
    t_tap = min(
        bench_op(lambda x_: x_ * jnp.float32(1.0).astype(x_.dtype),
                 xf, iters=args.iters)
        for _ in range(3)
    )
    print(f"harness tap floor (elementwise on x): {t_tap * 1e6:.2f} us")

    for name in args.shapes.split(","):
        n, k = SHAPES[name]
        _codes, planes, scales, table = make_w4sym(n, k, g)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        ideal = bytes_moved(m, n, k, g) / HBM
        print(f"== {name} N={n} K={k} ideal {ideal * 1e6:.1f} us")

        cfgs = []
        for bm in (8, 16):
            for bn in {1024, 2048, n}:
                for bk in {512, 1024, 2048, k}:
                    c = KernelConfig(block_m=bm, block_n=bn, block_k=bk)
                    if is_config_supported(c, m, n, k, 4, g):
                        cfgs.append(c)
        seen = set()
        for c in cfgs:
            if c.key() in seen:
                continue
            seen.add(c.key())

            def fq(x_, c=c):
                return lut_gemm.lut_qgemm(
                    x_, planes, scales, table, num_bits=4,
                    interpret=False, layout="w4sym", config=c,
                )

            def ff(x_, c=c):
                return kernel_lab.run_floor(
                    x_, planes, scales, c.block_m, c.block_n, c.block_k, g
                )

            row = f"  {c.key():38s}"
            variants = [("qgemm", fq)]
            if c.block_m <= m:
                # run_floor does not pad x to block_m (lut_qgemm does);
                # bm > m would give an empty grid and a bogus ~1 us reading
                variants.append(("floor", ff))
            for tag, f in variants:
                try:
                    t = min(bench_op(f, x, iters=args.iters) for _ in range(2))
                    row += f"  {tag} {t * 1e6:7.1f} us ({100 * ideal / t:5.1f}%)"
                except Exception as e:
                    row += f"  {tag} FAIL({str(e).splitlines()[0][:40]})"
            print(row, flush=True)


if __name__ == "__main__":
    main()
