"""Round-3 kernel lab: the small-projection ramp (VERDICT r2 weak #1).

The r2 bench aggregate (48.2%) sits 8 points below the kernel's measured
VPU ceiling (~56% on N28672 K8192) because the small decode projections
(o: 41%, qkv: 44%) pay fixed per-invocation cost + pipeline ramp that the
big shape amortizes. Three measurements:

  floor  — bench_op loop/tap overhead floor (trivial op), to know how much
           of a small-shape measurement is harness, not kernel
  sweep  — deep-grid config sweep per bench shape at decode M
  stack  — the four projections chained in ONE loop body (a real decode
           layer's GEMM stack in steady state), vs the sum of parts

Usage:
  python -u scripts/kernel_lab3.py --mode floor
  python -u scripts/kernel_lab3.py --mode sweep --shape o --m 8
  python -u scripts/kernel_lab3.py --mode stack --m 8
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu import packing
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.kernel_config import KernelConfig, is_config_supported
from flute_tpu.utils.benchmark import bench_op

SHAPES = {
    "qkv": (6144, 4096),
    "o": (4096, 4096),
    "gate_up": (28672, 4096),
    "down": (4096, 14336),
}
ROOF = 819.0


def make_layer(n, k, bits=4, group=64, seed=0, dt=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 2**bits, size=(k, n), dtype=np.int32)
    planes = [jax.device_put(p) for p in packing.pack(codes, bits)]
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // group, n)), dt)
    table = jnp.asarray(np.sort(rng.standard_normal(2**bits)), jnp.float32)
    return planes, scales, table


def layer_bytes(planes, scales, m, n, k):
    return (
        sum(p.size * 4 for p in planes) + scales.size * 2 + m * k * 2 + m * n * 2
    )


def mode_floor(args):
    # tiny pallas-free op: the loop body cost that is pure harness
    x = jnp.zeros((8, 4096), jnp.bfloat16)

    def f(x_):
        return x_ + jnp.bfloat16(1.0)

    for iters in (400, 2000):
        t = min(bench_op(f, x, iters=iters) for _ in range(3))
        print(f"floor (x+1 [8,4096], iters={iters}): {t*1e6:.2f} us", flush=True)

    # and a minimal real matmul for scale
    w = jnp.zeros((4096, 256), jnp.bfloat16)

    def g(x_):
        return jnp.dot(x_, w)

    t = min(bench_op(g, x, iters=1000) for _ in range(3))
    print(f"floor (8x4096x256 matmul): {t*1e6:.2f} us", flush=True)


def _block_divisors(dim, align, lo, hi):
    return [d for d in range(lo, hi + 1, align) if dim % d == 0]


def sweep_configs(n, k, m):
    """All VMEM-legal (bm, bn, bk) including non-power-of-2 divisors
    (qkv N=6144 admits bn=3072; down K=14336 admits bk=3584/7168) — the
    registry's power-of-2-only enumeration missed these."""
    out = []
    bns = _block_divisors(n, 128, 512, 8192)
    bks = _block_divisors(k, 256, 512, 8192)
    for bm in ({8, 16} if m <= 16 else {min(256, m)}):
        for bn in bns:
            for bk in bks:
                cfg = KernelConfig(block_m=bm, block_n=bn, block_k=bk)
                if is_config_supported(cfg, m, n, k, 4, 64):
                    out.append(cfg)
    return out


def mode_sweep(args):
    n, k = SHAPES[args.shape]
    m = args.m
    planes, scales, table = make_layer(n, k)
    byts = layer_bytes(planes, scales, m, n, k)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((m, k)), jnp.bfloat16)
    sol = byts / ROOF / 1e9
    print(f"{args.shape}: N={n} K={k} M={m}; SOL {sol*1e6:.1f} us", flush=True)
    results = []
    for cfg in sweep_configs(n, k, m):
        grid = (max(1, m // cfg.block_m), n // cfg.block_n, k // cfg.block_k)
        steps = grid[0] * grid[1] * grid[2]

        def f(x_, c=cfg):
            return lut_gemm.lut_qgemm(
                x_, planes, scales, table, num_bits=4, config=c, interpret=False
            )

        t0 = time.time()
        try:
            est = byts / 400e9
            iters = min(40000, max(400, int(0.15 / est)))
            t = min(bench_op(f, x, iters=iters) for _ in range(3))
        except Exception as e:
            print(f"  {cfg.key():40s}: FAILED {str(e)[:60]}", flush=True)
            continue
        bw = byts / t / 1e9
        results.append((t, cfg))
        print(
            f"  {cfg.key():40s}: {t*1e6:7.1f} us  {bw:6.1f} GB/s "
            f"({100*bw/ROOF:5.1f}%)  grid={grid} ({steps} steps) "
            f"[{time.time()-t0:.0f}s]",
            flush=True,
        )
    results.sort(key=lambda p: p[0])
    print("BEST:", results[0][1].key(), f"{results[0][0]*1e6:.1f} us", flush=True)


def mode_check(args):
    """Re-measure named configs on one shape, 5 reps each, fresh process."""
    n, k = SHAPES[args.shape]
    m = args.m
    planes, scales, table = make_layer(n, k)
    byts = layer_bytes(planes, scales, m, n, k)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((m, k)), jnp.bfloat16)
    for key in args.configs.split(","):
        cfg = KernelConfig.from_key(key)

        def f(x_, c=cfg):
            return lut_gemm.lut_qgemm(
                x_, planes, scales, table, num_bits=4, config=c, interpret=False
            )

        # small shapes need a long timed window: tunnel dispatch jitter is
        # ~2 ms, so a 40 ms window gives +-1.5 us/iter noise on a 25 us op.
        # 300 ms windows cut that to ~0.2 us.
        est = byts / 400e9
        iters = min(40000, max(400, int(0.3 / est)))
        ts = [bench_op(f, x, iters=iters) for _ in range(5)]
        t = min(ts)
        print(
            f"  {key:40s}: min {t*1e6:6.1f} us ({100*byts/t/1e9/ROOF:5.1f}%) "
            f"all=[{', '.join(f'{u*1e6:.1f}' for u in ts)}]",
            flush=True,
        )


def mode_stack(args):
    m = args.m
    layers = {}
    for name, (n, k) in SHAPES.items():
        planes, scales, table = make_layer(n, k)
        layers[name] = (planes, scales, table, n, k)

    rng = np.random.default_rng(1)
    xs = {
        name: jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        for name, (_, _, _, _, k) in layers.items()
    }

    cfgs = {}
    if args.configs:
        for part in args.configs.split(","):
            nm, key = part.split("=")
            cfgs[nm] = KernelConfig.from_key(key)

    def gemm(name, x_):
        planes, scales, table, n, k = layers[name]
        return lut_gemm.lut_qgemm(
            x_, planes, scales, table, num_bits=4,
            config=cfgs.get(name), interpret=False,
        )

    # individual (for reference)
    total_bytes = 0
    for name, (planes, scales, table, n, k) in layers.items():
        byts = layer_bytes(planes, scales, m, n, k)
        total_bytes += byts
        est = byts / 400e9
        iters = min(4000, max(200, int(0.04 / est)))
        t = min(bench_op(f, xs[name], iters=iters)
                for f in [lambda x_, nm=name: gemm(nm, x_)]
                for _ in range(3))
        print(
            f"  solo {name:8s}: {t*1e6:7.1f} us ({100*byts/t/1e9/ROOF:5.1f}%)",
            flush=True,
        )

    # chained stack in one loop body
    order = ["qkv", "o", "gate_up", "down"]

    def stack(x_qkv, x_o, x_gu, x_dn):
        ys = []
        xin = {"qkv": x_qkv, "o": x_o, "gate_up": x_gu, "down": x_dn}
        prev_tap = None
        for name in order:
            xi = xin[name]
            if prev_tap is not None:
                xi = xi + (prev_tap * 1e-30).astype(xi.dtype)
            y = gemm(name, xi)
            prev_tap = y[(0, 0)].astype(jnp.float32)
            ys.append(y)
        # the returned array must depend on the LAST gemm's tap or XLA
        # dead-code-eliminates it (bench_op only taps the return value)
        return ys[0] + (prev_tap * 1e-30).astype(ys[0].dtype)

    # NB: bench_op's own tap re-perturbs only x_qkv; the internal chain
    # serializes the other three behind it each iteration.
    t = min(
        bench_op(stack, xs["qkv"], xs["o"], xs["gate_up"], xs["down"], iters=600)
        for _ in range(3)
    )
    bw = total_bytes / t / 1e9
    print(
        f"  stack (chained): {t*1e6:7.1f} us  {bw:6.1f} GB/s "
        f"({100*bw/ROOF:5.1f}%)",
        flush=True,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["floor", "sweep", "stack", "check"],
                   required=True)
    p.add_argument("--shape", default="o", choices=list(SHAPES))
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--configs", default="",
                   help="name=configkey,... per-layer overrides for stack mode")
    args = p.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    {"floor": mode_floor, "sweep": mode_sweep, "stack": mode_stack,
     "check": mode_check}[args.mode](args)


if __name__ == "__main__":
    main()
