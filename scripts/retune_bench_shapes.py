"""Final-selection pass for the bench.py decode shapes (round 3).

For each Llama-3.1-8B fused decode shape, re-measures the sweep finalists
(scripts/kernel_lab3.py r3 sweeps) best-of-N in one quiet process, verifies
the winner against the host oracle, and writes it into the packaged tuned
registry under the M=16 bucket (`tune._memo_key` maps decode M<=16 there).

Run on the real chip in a quiet window (no concurrent CPU jobs):
  python -u scripts/retune_bench_shapes.py [--reps 5] [--dry-run]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu import packing
from flute_tpu import tune
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.kernel_config import KernelConfig
from flute_tpu.utils.benchmark import bench_op

# shape -> finalists from the r3 sweeps (/tmp/lab3_{o,r3,down}.log)
FINALISTS = {
    ("llama8b.qkv", 6144, 4096): [
        "m16n1024k4096_gather8_c256_s1",
        "m8n6144k512_gather8_c256_s1",
        "m16n1536k4096_gather8_c256_s1",
    ],
    ("llama8b.o", 4096, 4096): [
        "m8n1024k2048_gather8_c256_s1",
        "m8n2048k1024_gather8_c256_s1",
        "m8n4096k1024_gather8_c256_s1",
        "m16n2048k2048_gather8_c256_s1",  # current registry entry
    ],
    ("llama8b.gate_up", 28672, 4096): [
        "m16n2048k2048_gather8_c256_s1",  # current registry entry
        "m8n1792k4096_gather8_c256_s1",
        "m8n2048k2048_gather8_c256_s1",
    ],
    ("llama8b.down", 4096, 14336): [
        "m8n4096k1024_gather8_c256_s1",
        "m8n2048k3584_gather8_c256_s1",
        "m16n1024k7168_gather8_c256_s1",
        "m16n512k2048_gather8_c256_s1",  # current registry entry
    ],
}

ROOF = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--out", default="flute_tpu/data/tuned_configs.json")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    tune.load_registry(args.out)
    tune._packaged_loaded = True

    rng = np.random.default_rng(0)
    for (name, n, k), keys in FINALISTS.items():
        codes = rng.integers(0, 16, size=(k, n), dtype=np.int32)
        planes = [jax.device_put(p) for p in packing.pack(codes, 4)]
        scales_np = rng.uniform(0.5, 1.5, (k // 64, n)).astype(np.float32)
        table_np = np.sort(rng.standard_normal(16)).astype(np.float32)
        scales = jnp.asarray(scales_np, jnp.bfloat16)
        table = jnp.asarray(table_np, jnp.float32)
        x_np = rng.standard_normal((args.m, k)).astype(np.float32)
        x = jnp.asarray(x_np, jnp.bfloat16)
        byts = sum(p.size * 4 for p in planes) + scales.size * 2 \
            + x.size * 2 + args.m * n * 2
        iters = min(40000, max(400, int(0.2 / (byts / 400e9))))
        results = []
        for key in keys:
            cfg = KernelConfig.from_key(key)

            def f(x_, c=cfg):
                return lut_gemm.lut_qgemm(
                    x_, planes, scales, table, num_bits=4, config=c,
                    interpret=False,
                )

            try:
                ts = [bench_op(f, x, iters=iters) for _ in range(args.reps)]
            except Exception as e:
                print(f"  {name} {key}: FAILED {str(e)[:60]}", flush=True)
                continue
            t = min(ts)
            results.append((t, cfg, f))
            print(
                f"  {name} {key}: min {t*1e6:6.1f} us "
                f"({100*byts/t/1e9/ROOF:4.1f}%) "
                f"all=[{', '.join(f'{u*1e6:.1f}' for u in ts)}]",
                flush=True,
            )
        if not results:
            continue
        results.sort(key=lambda r: r[0])

        # oracle-verify fastest-first (tune.pick_verified discipline)
        want = tune._host_oracle(x_np, codes, scales_np, table_np, jnp.bfloat16)
        denom = max(float(np.abs(want).max()), 1e-6)
        chosen = None
        for t, cfg, f in results:
            got = np.asarray(f(x), np.float32)
            if float(np.abs(got - want).max()) / denom <= 2 * tune.RTOL["bfloat16"]:
                chosen = (t, cfg)
                break
            print(f"  {name}: {cfg.key()} FAILED oracle — skipped", flush=True)
        if chosen is None:
            print(f"  {name}: no candidate passed; registry unchanged", flush=True)
            continue
        t, cfg = chosen
        key = tune._memo_key(args.m, n, k, 4, 64, "bfloat16",
                             tune._device_kind())
        old = tune._MEMO.get(key)
        tune._MEMO[key] = cfg
        print(
            f"{name}: {old.key() if old else '-'} -> {cfg.key()} "
            f"({t*1e6:.1f} us)",
            flush=True,
        )
    if not args.dry_run:
        tune.save_registry(args.out)
        print(f"saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
