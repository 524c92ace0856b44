"""Round-4 kernel lab: the sign-symmetric 4-bit (w4sym) path on-chip.

Measures, on the reference big shape and the Llama-3.1-8B bench shapes:
  * w4sym vs general-W4 (chain) vs W3-wide, per block config;
  * on-chip identity bit-exactness for w4sym (the hw mod-8 wrap contract
    extended to the 3-window byte-field gathers);
  * compile wall-time per config (guard against the pfdirect-style Mosaic
    pathology documented in docs/KERNEL_NOTES.md).

Usage: python scripts/kernel_lab4.py [--quick]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu import packing
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.kernel_config import KernelConfig
from flute_tpu.utils.benchmark import bench_op

HBM = 819e9

SHAPES = [
    ("ref", 28672, 8192),
    ("qkv", 6144, 4096),
    ("o", 4096, 4096),
    ("gate_up", 28672, 4096),
    ("down", 4096, 14336),
]


def make_w4sym(n, k, g, seed=0, on_device=True):
    """Codes + packed planes. ``on_device`` generates and packs on the
    chip — the dev tunnel moves ~4 MB/s, so uploading a 117 MB packed
    plane takes ~half an hour; on-device PRNG + pack_w4_sym_jnp moves
    nothing."""
    rng = np.random.default_rng(seed)
    mags = np.sort(np.abs(rng.standard_normal(8))).astype(np.float32)
    table = jnp.asarray(np.concatenate([mags, -mags]))
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // g, n)), jnp.bfloat16)
    if on_device:
        codes = jax.jit(
            lambda key: jax.random.randint(key, (k, n), 0, 16, jnp.int32)
        )(jax.random.PRNGKey(seed))
        planes = [p.block_until_ready()
                  for p in jax.jit(packing.pack_w4_sym_jnp)(codes)]
        return codes, planes, scales, table
    codes = rng.integers(0, 16, size=(k, n), dtype=np.int32)
    planes = [jax.device_put(p) for p in packing.pack_w4_sym_np(codes)]
    return codes, planes, scales, table


def report(name, t, n, k, bits, m):
    byts = n * k * bits / 8 + (k // 64) * n * 2 + m * k * 2 + m * n * 2
    bw = byts / t / 1e9
    print(
        f"  {name:42s}: {t * 1e6:8.1f} us  {bw:7.1f} GB/s "
        f"({100 * bw / (HBM / 1e9):5.1f}%)",
        flush=True,
    )
    return bw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--shapes", default="ref")
    ap.add_argument("--no-identity", action="store_true")
    ap.add_argument("--no-baselines", action="store_true")
    args = ap.parse_args()
    assert jax.default_backend() != "cpu", "run on the TPU"
    g = 64
    m = args.m

    # identity check ONCE on a tunnel-friendly shape (the big-shape eye
    # would move ~600 MB host<->device through the tunnel); verified
    # bit-exact on-chip 2026-08-19 — skip with --no-identity when timing
    if not args.no_identity:
        print("== identity (N=512 K=1024) ==", flush=True)
        codes_s, planes_s, scales_s, table_s = make_w4sym(512, 1024, g)
        eye = jnp.eye(1024, dtype=jnp.bfloat16)
        t0 = time.time()
        got = np.asarray(
            lut_gemm.lut_qgemm(
                eye, planes_s, scales_s, table_s, num_bits=4, layout="w4sym",
                interpret=False,
            ),
            np.float32,
        )
        want = np.asarray(
            lut_gemm.dequantize_codes(
                jnp.asarray(codes_s), scales_s, table_s, jnp.bfloat16
            ),
            np.float32,
        )
        exact = np.array_equal(got, want)
        print(
            f"  identity bit-exact: {exact} [{time.time() - t0:.1f}s]",
            flush=True,
        )
        if not exact:
            bad = np.argwhere(got != want)
            print(f"  MISMATCHES: {bad.shape[0]} first {bad[:4]}", flush=True)
            return

    want_names = args.shapes.split(",")
    for name, n, k in SHAPES:
        if name not in want_names:
            continue
        print(f"== {name}  N={n} K={k} M={m} ==", flush=True)
        codes, planes, scales, table = make_w4sym(n, k, g)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((m, k)), jnp.bfloat16)

        cfgs = []
        for bn in (2048, 1024, 512):
            for bk in (2048, 1024):
                if n % bn == 0 and k % bk == 0:
                    cfgs.append(KernelConfig(block_m=16, block_n=bn, block_k=bk))
        if args.quick:
            cfgs = cfgs[:2]
        for cfg in cfgs:
            def f(x_, planes_=planes, scales_=scales, table_=table, c=cfg):
                return lut_gemm.lut_qgemm(
                    x_, planes_, scales_, table_, num_bits=4, config=c,
                    layout="w4sym", interpret=False,
                )

            t0 = time.time()
            f(x).block_until_ready()
            compile_s = time.time() - t0
            t = min(bench_op(f, x, iters=600 if name == "ref" else 1500)
                    for _ in range(3))
            report(f"w4sym {cfg.key()} [compile {compile_s:.0f}s]", t, n, k, 4, m)

        # general-W4 + W3-wide baselines on the same shape (packed on
        # device — see make_w4sym tunnel note)
        if args.no_baselines:
            continue
        planes_g = [
            p.block_until_ready()
            for p in jax.jit(lambda c: packing.pack_jnp(c, 4))(codes)
        ]
        tbl_g = jnp.asarray(np.sort(np.asarray(table)))

        def fg(x_):
            return lut_gemm.lut_qgemm(
                x_, planes_g, scales, tbl_g, num_bits=4, interpret=False
            )

        t = min(bench_op(fg, x, iters=600 if name == "ref" else 1500)
                for _ in range(3))
        report("W4 general (registry/default cfg)", t, n, k, 4, m)

        planes3 = [
            p.block_until_ready()
            for p in jax.jit(lambda c: packing.pack_w3_wide_jnp(c & 7))(codes)
        ]
        tbl3 = jnp.asarray(np.sort(np.random.default_rng(2).standard_normal(8)))

        def f3(x_):
            return lut_gemm.lut_qgemm(
                x_, planes3, scales, tbl3, num_bits=3, interpret=False
            )

        t = min(bench_op(f3, x, iters=600 if name == "ref" else 1500)
                for _ in range(3))
        report("W3-wide (registry/default cfg)", t, n, k, 3, m)


if __name__ == "__main__":
    main()
