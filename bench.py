"""Headline benchmark: Llama-3.1-8B NFL-W4G64 decode GEMM stack vs the
HBM weight-bandwidth roofline (the driver-set north star, BASELINE.json).

Runs the fused LUT-dequant GEMM over every projection shape of one
Llama-3.1-8B decoder layer at decode batch M, measures pure device time via
a serialized fori_loop (tunnel-safe, see flute_tpu/utils/benchmark.py), and
reports the aggregate effective bandwidth as % of the HBM roofline.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "%", "vs_baseline": N}
where vs_baseline is value / 85.0 (the >=85%-of-roofline target).
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def hbm_gbps() -> float:
    """HBM bandwidth of the attached chip (v5e default; override by env)."""
    import os

    if "FLUTE_TPU_HBM_GBPS" in os.environ:
        return float(os.environ["FLUTE_TPU_HBM_GBPS"])
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819.0
    if "v5p" in kind or "v5" in kind:
        return 2765.0
    if "v4" in kind:
        return 1228.0
    if "v6" in kind or "trillium" in kind:
        return 1640.0
    return 819.0


# Llama-3.1-8B decoder-layer GEMM shapes (N=out, K=in) in the fused-layer
# serving layout (qkv / gate_up fused, as in the reference's vLLM stack;
# shape family mirrors reference tests/shapes.py:1-96).
LLAMA31_8B_LAYER = [
    ("qkv", 6144, 4096),
    ("o", 4096, 4096),
    ("gate_up", 28672, 4096),
    ("down", 4096, 14336),
]


def main():
    m = 8  # decode batch (tokens in flight)
    bits, group = 4, 64
    dt = jnp.bfloat16

    from flute_tpu import packing
    from flute_tpu.ops import lut_gemm
    from flute_tpu.utils.benchmark import bench_op

    rng = np.random.default_rng(0)
    total_time = 0.0
    total_bytes = 0.0
    per_layer = {}
    for name, n, k in LLAMA31_8B_LAYER:
        codes = rng.integers(0, 2**bits, size=(k, n), dtype=np.int32)
        planes = [jax.device_put(p) for p in packing.pack(codes, bits)]
        scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // group, n)), dt)
        table = jnp.asarray(np.sort(rng.standard_normal(2**bits)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((m, k)), dt)

        def f(x_, planes_=planes, scales_=scales, table_=table):
            return lut_gemm.lut_qgemm(
                x_, planes_, scales_, table_, num_bits=bits, interpret=False
            )

        weight_bytes_est = sum(p.size * 4 for p in planes)
        # scale iteration count so the timed delta spans >= ~40 ms of
        # device time — small projections need thousands of iterations for
        # the slope measurement to rise above tunnel dispatch noise
        est = weight_bytes_est / (500e9)
        iters = min(4000, max(100, int(0.04 / est)))
        # best-of-3: the slope measurement is tunnel-noise-sensitive; the
        # minimum reflects device capability (reference tune.py uses
        # triton do_bench's min the same way)
        t = min(bench_op(f, x, iters=iters) for _ in range(3))
        weight_bytes = sum(p.size * 4 for p in planes)
        byts = weight_bytes + scales.size * 2 + x.size * 2 + m * n * 2
        total_time += t
        total_bytes += byts
        per_layer[name] = dict(us=t * 1e6, gbps=byts / t / 1e9)

    roof = hbm_gbps()
    agg_gbps = total_bytes / total_time / 1e9
    pct = 100.0 * agg_gbps / roof
    # decode tokens/s/chip over the per-layer GEMM stack (32 layers).
    tok_s = 1.0 / (total_time * 32) * m

    for name, d in per_layer.items():
        print(
            f"# {name:5s}: {d['us']:8.1f} us  {d['gbps']:7.1f} GB/s "
            f"({100 * d['gbps'] / roof:5.1f}%)",
            file=sys.stderr,
        )
    print(
        f"# aggregate: {agg_gbps:.1f} GB/s of {roof:.0f} GB/s; "
        f"~{tok_s:.0f} tok/s/chip (GEMM stack only, M={m})",
        file=sys.stderr,
    )
    # secondary context for readers (stderr; the driver JSON stays W4):
    # the chain-free 3-bit wide layout is the throughput point on v5e —
    # 69.2% roofline on the reference shape, full-model 838 tok/s at B=8
    # vs 562 for W4 (docs/BENCH_NOTES.md)
    print(
        "# W3-wide comparison: 170.5 us / 69.2% roofline on N28672 K8192 "
        "(see docs/BENCH_NOTES.md)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "llama31_8b_w4g64_decode_gemm_roofline",
                "value": round(pct, 2),
                "unit": "%",
                "vs_baseline": round(pct / 85.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
