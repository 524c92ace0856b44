"""Headline benchmark: Llama-3.1-8B NFL-W4G64 decode GEMM stack vs the
HBM weight-bandwidth roofline (the driver-set north star, BASELINE.json).

Runs the fused LUT-dequant GEMM over every projection shape of one
Llama-3.1-8B decoder layer at decode batch M, measures pure device time via
a serialized fori_loop (tunnel-safe, see flute_tpu/utils/benchmark.py), and
reports the aggregate effective bandwidth as % of the HBM roofline.

The headline ``value`` is the **production 4-bit path**: the
sign-symmetric NF grid on the chainless w4sym layout (flute_tpu/packing.py
pack_w4_sym_np; default for 4-bit in nn.quantize_linear and the CLI).
Also reported in the same JSON object: the general arbitrary-table W4
path (``w4_general_pct``), the W3-wide layout (``w3_wide_pct``), and a
float16 w4sym point (``w4sym_f16_pct`` — the reference's flagship dtype,
/root/reference/README.md:233).

Per-shape chosen kernel-config keys are printed to stderr so the driver
bench and the kernel-lab floors can be reconciled config-by-config
(round-3 verdict weak #2).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "%", "vs_baseline": N, ...}
where vs_baseline is value / 85.0 (the >=85%-of-roofline target).
"""

import json
import os
import sys

# persistent compile cache: the four stacks share most specializations
# across driver runs (first run pays ~30-60s/kernel through the tunnel)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flute_tpu_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np


def hbm_gbps() -> float:
    """HBM bandwidth of the attached chip (v5e default; override by env)."""
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


def run_stack(
    bits: int,
    *,
    layout: str = "plane",
    m: int = 8,
    group: int = 64,
    dtype=jnp.bfloat16,
    label: str = "",
):
    """Measure the decode GEMM stack at the given width/layout/dtype.

    Returns (aggregate_pct_of_roofline, tok_s, per_layer dict)."""
    from flute_tpu import packing
    from flute_tpu.ops import lut_gemm
    from flute_tpu.ops.kernel_config import get_kernel_config
    from flute_tpu.utils.benchmark import bench_op

    rng = np.random.default_rng(0)
    total_time = 0.0
    total_bytes = 0.0
    per_layer = {}
    roof = hbm_gbps()
    for name, n, k in LLAMA31_8B_LAYER:
        # generate codes and pack ON DEVICE: the dev tunnel moves packed
        # planes at single-digit MB/s — uploading ~100 MB of planes per
        # stack would dominate the bench wall-clock
        codes = jax.jit(
            lambda key, _k=k, _n=n, _b=bits: jax.random.randint(
                key, (_k, _n), 0, 2**_b, jnp.int32
            )
        )(jax.random.PRNGKey(0))
        if layout == "w4sym":
            raw = jax.jit(packing.pack_w4_sym_jnp)(codes)
            mags = np.sort(np.abs(rng.standard_normal(8))).astype(np.float32)
            table = jnp.asarray(np.concatenate([mags, -mags]))
        elif layout == "w3wide":
            raw = jax.jit(packing.pack_w3_wide_jnp)(codes)
            table = jnp.asarray(
                np.sort(rng.standard_normal(8)), jnp.float32
            )
        else:
            raw = jax.jit(
                lambda c, _b=bits: packing.pack_jnp(c, _b)
            )(codes)
            table = jnp.asarray(
                np.sort(rng.standard_normal(2**bits)), jnp.float32
            )
        planes = [p.block_until_ready() for p in raw]
        scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // group, n)), dtype)
        x = jnp.asarray(rng.standard_normal((m, k)), dtype)

        cfg = get_kernel_config(
            m, n, k, bits, group, dtype=x.dtype,
            layout=layout if layout == "w4sym" else "auto",
        )
        print(
            f"# {label:6s} {name:8s} config {cfg.key()}",
            file=sys.stderr,
        )

        def f(x_, planes_=planes, scales_=scales, table_=table):
            return lut_gemm.lut_qgemm(
                x_, planes_, scales_, table_, num_bits=bits, interpret=False,
                layout=layout if layout == "w4sym" else "auto",
            )

        weight_bytes = sum(p.size * 4 for p in planes)
        # scale iteration count so the timed delta spans >= ~40 ms of
        # device time — small projections need thousands of iterations for
        # the slope measurement to rise above tunnel dispatch noise
        est = weight_bytes / (500e9)
        iters = min(4000, max(100, int(0.04 / est)))
        # best-of-3: the slope measurement is tunnel-noise-sensitive; the
        # minimum reflects device capability (reference tune.py uses
        # triton do_bench's min the same way)
        t = min(bench_op(f, x, iters=iters) for _ in range(3))
        byts = weight_bytes + scales.size * 2 + x.size * 2 + m * n * 2
        total_time += t
        total_bytes += byts
        per_layer[name] = dict(us=t * 1e6, gbps=byts / t / 1e9)

    agg_gbps = total_bytes / total_time / 1e9
    pct = 100.0 * agg_gbps / roof
    # decode tokens/s/chip over the per-layer GEMM stack (32 layers).
    tok_s = 1.0 / (total_time * 32) * m
    return pct, tok_s, per_layer


def print_stack(label, pct, tok_s, per_layer, roof):
    for name, d in per_layer.items():
        print(
            f"# {label:6s} {name:8s}: {d['us']:8.1f} us  {d['gbps']:7.1f} GB/s "
            f"({100 * d['gbps'] / roof:5.1f}%)",
            file=sys.stderr,
        )
    print(
        f"# {label} aggregate: {pct:.1f}% of {roof:.0f} GB/s roofline; "
        f"~{tok_s:.0f} tok/s/chip (GEMM stack only)",
        file=sys.stderr,
    )


def try_stack(out, label, *args, **kwargs):
    """Run one stack; on failure record null and keep the bench alive.

    Round-4 lesson: Mosaic on some chips rejects whole dtypes (v5e:
    "Unsupported type in mosaic dialect: 'f16'"); one secondary stack
    must never take down the headline JSON line."""
    roof = hbm_gbps()
    try:
        pct, tok_s, per_layer = run_stack(*args, label=label, **kwargs)
        print_stack(label, pct, tok_s, per_layer, roof)
        return pct, tok_s
    except Exception as e:  # noqa: BLE001 - report-and-continue by design
        msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
        print(f"# {label} stack FAILED: {msg}", file=sys.stderr)
        out.setdefault("errors", {})[label] = msg
        return None, None


def main():
    m = 8  # decode batch (tokens in flight)
    roof = hbm_gbps()
    out = {
        "metric": "llama31_8b_w4g64_decode_gemm_roofline",
        "value": 0.0,
        "unit": "%",
        "vs_baseline": 0.0,
    }

    # Production W4: sign-symmetric NF grid on the chainless w4sym layout.
    pct, tok_s = try_stack(out, "W4sym", 4, layout="w4sym", m=m)
    if pct is not None:
        out["value"] = round(pct, 2)
        out["vs_baseline"] = round(pct / 85.0, 4)
        out["w4_tok_s"] = round(tok_s, 1)

    # General arbitrary-table W4 (compat path: imported checkpoints with
    # asymmetric tables, e.g. QLoRA NF4 / bitsandbytes).
    g_pct, g_tok_s = try_stack(out, "W4gen", 4, layout="plane", m=m)
    if g_pct is not None:
        out["w4_general_pct"] = round(g_pct, 2)
        out["w4_general_tok_s"] = round(g_tok_s, 1)
        if pct is None:  # headline fallback if the sym path ever breaks
            out["value"] = round(g_pct, 2)
            out["vs_baseline"] = round(g_pct / 85.0, 4)

    # W3-wide: the 3-bit throughput point (docs/BENCH_NOTES.md).
    w3_pct, w3_tok_s = try_stack(out, "W3w", 3, layout="w3wide", m=m)
    if w3_pct is not None:
        out["w3_wide_pct"] = round(w3_pct, 2)
        out["w3_wide_tok_s"] = round(w3_tok_s, 1)

    # f16 visibility (reference flagship dtype): w4sym stack at float16.
    # Mosaic on v5e has no f16 vector type, so on TPU this rides the
    # documented f32-compute fallback (ops/lut_gemm.lut_qgemm); if even
    # that fails the stack is reported in errors.W4sf16 with a null pct.
    f16_pct, _ = try_stack(
        out, "W4sf16", 4, layout="w4sym", m=m, dtype=jnp.float16
    )
    out["w4sym_f16_pct"] = round(f16_pct, 2) if f16_pct is not None else None

    print(json.dumps(out))


if __name__ == "__main__":
    main()
