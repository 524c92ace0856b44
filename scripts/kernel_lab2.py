"""Round-2 kernel laboratory: candidate dequant pipelines to close the
decode roofline gap (49.4% -> target >=70%), measured on the real chip.

Variants (all W4G64, bf16, reference shape M16 N28672 K8192 by default):

  prod      -- production lut_qgemm (baseline; ~273 us expected).
  vmembw    -- chained elementwise int32 ops on resident VMEM data:
               establishes the per-op cost unit (ALU vs VMEM-BW bound).
  pfdirect  -- chain without the ce/co split: gathers index the raw 8-bit
               pair field via the hw mod-8 wrap; high-bit tests on pf.
  sep       -- separable table T[c] = A[c&3] + B[c>>2]: two 2-bit pair
               streams, single 4-entry gathers with A[j&3] operand layout
               (zero index-prep ops), two matmul accumulations.
  sep1      -- sep with one matmul: deq = deqA + deqB (bf16 add) feeding a
               single dot (MXU add -> VPU add tradeoff).
  int4      -- affine table T[c] = z + c*d (Marlin-style arithmetic fast
               path, reference flute/csrc/marlin_utils.hpp:68-89): no
               gathers, int->bf16 convert + affine folded into group-acc.

Usage: python scripts/kernel_lab2.py --variants prod,sep,... [--m 16 ...]
"""

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flute_tpu import packing
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.lut_gemm import (
    _bits16,
    _gather_sublane,
    _table_tile_scalar,
    _unpack_pair_fields,
)
from flute_tpu.quantize import nf
from flute_tpu.utils.benchmark import bench_op

HBM = 819.0


def report(name, t, nbytes):
    gbps = nbytes / t / 1e9
    print(f"{name:12s}: {t*1e6:8.1f} us  {gbps:7.1f} GB/s ({100*gbps/HBM:5.1f}%)",
          flush=True)
    return t


def gemm_bytes(m, n, k, bits, g):
    return k * n * bits // 8 + (k // g) * n * 2 + m * k * 2 + m * n * 2


# --------------------------------------------------------------------------
# vmembw: cost of one elementwise int32 op on a [rows, bn] block
# --------------------------------------------------------------------------


def vmembw_kernel(w_ref, o_ref, *, nops):
    v = w_ref[:]
    for i in range(nops):
        v = v ^ (v >> 1)  # dependent chain, 2 ops per step
    o_ref[:] = v


def run_vmembw(rows, bn, nops, iters):
    w = jnp.asarray(np.random.default_rng(0).integers(0, 2**30, (rows, bn)),
                    jnp.int32)
    f = jax.jit(lambda w_: pl.pallas_call(
        functools.partial(vmembw_kernel, nops=nops),
        out_shape=jax.ShapeDtypeStruct((rows, bn), jnp.int32),
    )(w_))
    f(w).block_until_ready()
    return bench_op(f, w, iters=iters)


# --------------------------------------------------------------------------
# pfdirect: chain on raw pair fields (no ce/co split); relies on hw wrap
# --------------------------------------------------------------------------


def pfdirect_kernel(x_ref, w_ref, s_ref, t_ref, o_ref, acc_ref, *, bk, g,
                    chunk, bn):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # extract raw 8-bit pair fields only (no ce/co split)
    words = w_ref[:]
    kc = (chunk // 2) // 4  # r=4 8-bit fields per int32 word
    slabs = []
    for c in range(bk // chunk):
        w = words[c * kc:(c + 1) * kc]
        for i in range(4):
            slabs.append((w >> (8 * i)) & 0xFF)
    pf = jnp.concatenate(slabs, axis=0)  # [bk/2, bn]; ce=pf&15, co=pf>>4

    tile = t_ref[:]
    ops = [jnp.broadcast_to(tile[:, c:c + 1], (8, bn)) for c in range(4)]
    # ops[0/1]: even lo/hi groups; ops[2/3]: odd lo/hi (pre-shifted << 16)
    co_idx = pf >> 4  # odd index; wrap handles & 7
    out = []
    for r in range(pf.shape[0] // 8):
        sl = slice(r * 8, (r + 1) * 8)
        p8 = pf[sl]
        o8 = co_idx[sl]
        ge = jnp.where((p8 & 8) != 0, _gather_sublane(ops[1], p8),
                       _gather_sublane(ops[0], p8))
        go = jnp.where((p8 & 128) != 0, _gather_sublane(ops[3], o8),
                       _gather_sublane(ops[2], o8))
        out.append(ge | go)
    payload = jnp.concatenate(out, axis=0)
    deq = pltpu.bitcast(payload, jnp.bfloat16)

    for gi in range(bk // g):
        part = jnp.dot(x_ref[:, gi * g:(gi + 1) * g], deq[gi * g:(gi + 1) * g],
                       preferred_element_type=jnp.float32)
        acc_ref[:] += part * s_ref[gi, :][None, :].astype(jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run_pfdirect(x, planes, scales, table, bm, bn, bk, g):
    m, k = x.shape
    n = scales.shape[1]
    tile = _table_tile_scalar(table, jnp.bfloat16, 16)
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(pfdirect_kernel, bk=bk, g=g, chunk=256, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // g, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(tile.shape, lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x, planes[0], scales, tile)


# --------------------------------------------------------------------------
# sep: separable table, two 2-bit pair streams, zero index-prep gathers
# --------------------------------------------------------------------------


def _sep_tables(table_a, table_b, ct):
    """[8,128] tiles: cols 0 = even-A (A[j&3]), 1 = odd-A, 2 = even-B,
    3 = odd-B; odd tables pre-shifted << 16."""
    a = _bits16(table_a, ct)
    b = _bits16(table_b, ct)
    a8 = jnp.tile(a, 2)  # A[j & 3] layout over 8 sublanes
    b8 = jnp.tile(b, 2)
    tile = jnp.zeros((8, 128), jnp.int32)
    tile = tile.at[:, 0].set(a8)
    tile = tile.at[:, 1].set(a8 << 16)
    tile = tile.at[:, 2].set(b8)
    tile = tile.at[:, 3].set(b8 << 16)
    return tile


def sep_kernel(x_ref, wa_ref, wb_ref, s_ref, t_ref, o_ref, acc_ref, *, bk, g,
               chunk, bn, one_mm):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tile = t_ref[:]
    ops = [jnp.broadcast_to(tile[:, c:c + 1], (8, bn)) for c in range(4)]

    def stream(words, op_e, op_o):
        # extract 4-bit pair fields (r=8 per word)
        kc = (chunk // 2) // 8
        slabs = []
        for c in range(bk // chunk):
            w = words[c * kc:(c + 1) * kc]
            for i in range(8):
                slabs.append((w >> (4 * i)) & 0xF)
        pf = jnp.concatenate(slabs, axis=0)  # [bk/2, bn] (ce | co << 2)
        co_idx = pf >> 2
        out = []
        for r in range(pf.shape[0] // 8):
            sl = slice(r * 8, (r + 1) * 8)
            # gather wraps mod 8; operands are laid out T[j & 3], so the
            # stray high bits of the raw field are harmless
            ge = _gather_sublane(op_e, pf[sl])
            go = _gather_sublane(op_o, co_idx[sl])
            out.append(ge | go)
        return pltpu.bitcast(jnp.concatenate(out, axis=0), jnp.bfloat16)

    deq_a = stream(wa_ref[:], ops[0], ops[1])
    deq_b = stream(wb_ref[:], ops[2], ops[3])

    if one_mm:
        deq = deq_a + deq_b
        for gi in range(bk // g):
            part = jnp.dot(x_ref[:, gi * g:(gi + 1) * g],
                           deq[gi * g:(gi + 1) * g],
                           preferred_element_type=jnp.float32)
            acc_ref[:] += part * s_ref[gi, :][None, :].astype(jnp.float32)
    else:
        for gi in range(bk // g):
            sl = slice(gi * g, (gi + 1) * g)
            part = jnp.dot(x_ref[:, sl], deq_a[sl],
                           preferred_element_type=jnp.float32)
            part += jnp.dot(x_ref[:, sl], deq_b[sl],
                            preferred_element_type=jnp.float32)
            acc_ref[:] += part * s_ref[gi, :][None, :].astype(jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run_sep(x, planes_a, planes_b, scales, table_a, table_b, bm, bn, bk, g,
            one_mm):
    m, k = x.shape
    n = scales.shape[1]
    tile = _sep_tables(table_a, table_b, jnp.bfloat16)
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(sep_kernel, bk=bk, g=g, chunk=256, bn=bn,
                          one_mm=one_mm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 16, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 16, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // g, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(tile.shape, lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x, planes_a[0], planes_b[0], scales, tile)


# --------------------------------------------------------------------------
# int4: affine table (z + c*d) -- arithmetic dequant, no gathers
# --------------------------------------------------------------------------


def int4_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, bk, g, chunk, bn,
                zero, delta):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ce, co = _unpack_pair_fields([w_ref[:]], (4,), bk, chunk)
    # int codes -> bf16 via f32 convert; payload-merge the two halves
    ve = _bits16(ce.astype(jnp.float32), jnp.bfloat16)
    vo = _bits16(co.astype(jnp.float32), jnp.bfloat16)
    deq = pltpu.bitcast(ve | (vo << 16), jnp.bfloat16)  # bf16(c) in [0,15]

    for gi in range(bk // g):
        sl = slice(gi * g, (gi + 1) * g)
        xg = x_ref[:, sl]
        part = jnp.dot(xg, deq[sl], preferred_element_type=jnp.float32)
        sg = s_ref[gi, :][None, :].astype(jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[:] += part * (sg * delta) + xsum * (sg * zero)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run_int4(x, planes, scales, bm, bn, bk, g, zero, delta):
    m, k = x.shape
    n = scales.shape[1]
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(int4_kernel, bk=bk, g=g, chunk=256, bn=bn,
                          zero=zero, delta=delta),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // g, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x, planes[0], scales)


# --------------------------------------------------------------------------


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--n", type=int, default=28672)
    p.add_argument("--k", type=int, default=8192)
    p.add_argument("--bn", type=int, default=2048)
    p.add_argument("--bk", type=int, default=2048)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--variants", type=str, default="prod,pfdirect,sep,sep1,int4")
    args = p.parse_args()
    m, n, k, bits, g = args.m, args.n, args.k, 4, 64
    bm = max(16, m)
    bn, bk = args.bn, args.bk
    variants = args.variants.split(",")
    nbytes = gemm_bytes(m, n, k, bits, g)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(k, n), dtype=np.int32)
    planes = [jax.device_put(p) for p in packing.pack_np(codes, bits)]
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // g, n)), jnp.bfloat16)
    table = nf.nf_values(4)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)

    want = None

    def oracle(tbl):
        return np.asarray(lut_gemm.lut_qgemm_reference(
            x, jnp.asarray(codes.astype(np.int8)), scales, tbl), np.float32)

    def check(got, tbl):
        w = oracle(tbl)
        return np.abs(np.asarray(got, np.float32) - w).max() / np.abs(w).max()

    if "prod" in variants:
        import flute_tpu
        f = jax.jit(lambda x_: lut_gemm.lut_qgemm(
            x_, planes, scales, table, num_bits=bits, interpret=False,
            config=flute_tpu.KernelConfig(block_m=bm, block_n=bn, block_k=bk),
        ))
        rel = check(f(x), table)
        t = bench_op(f, x, iters=args.iters)
        report("prod", t, nbytes)
        print(f"   rel={rel:.2e}")

    if "pfdirect" in variants:
        f = jax.jit(lambda x_: run_pfdirect(x_, planes, scales, table, bm, bn, bk, g))
        rel = check(f(x), table)
        t = bench_op(f, x, iters=args.iters)
        report("pfdirect", t, nbytes)
        print(f"   rel={rel:.2e}")

    if {"sep", "sep1"} & set(variants):
        # separable surrogate table: A over low 2 bits, B over high 2 bits
        ta = np.asarray([-0.3, -0.1, 0.1, 0.3], np.float32)
        tb = np.asarray([-0.9, -0.2, 0.2, 0.9], np.float32)
        sep_t = jnp.asarray((ta[None, :] + tb[:, None]).reshape(-1))  # T[c], c=b<<2|a
        pa = [jax.device_put(pp) for pp in packing.pack_np(codes & 3, 2)]
        pb = [jax.device_put(pp) for pp in packing.pack_np(codes >> 2, 2)]
        for name, one_mm in (("sep", False), ("sep1", True)):
            if name not in variants:
                continue
            f = jax.jit(lambda x_, om=one_mm: run_sep(
                x_, pa, pb, scales, jnp.asarray(ta), jnp.asarray(tb),
                bm, bn, bk, g, om))
            rel = check(f(x), sep_t)
            t = bench_op(f, x, iters=args.iters)
            report(name, t, nbytes)
            print(f"   rel={rel:.2e}")

    if "int4" in variants:
        zero, delta = -8.0 * 0.05, 0.05  # T[c] = (c - 8) * 0.05
        aff_t = jnp.asarray((np.arange(16) - 8.0) * 0.05, jnp.float32)
        f = jax.jit(lambda x_: run_int4(x_, planes, scales, bm, bn, bk, g,
                                        zero, delta))
        rel = check(f(x), aff_t)
        t = bench_op(f, x, iters=args.iters)
        report("int4", t, nbytes)
        print(f"   rel={rel:.2e}")

    if "slabstream" in variants:
        f = jax.jit(lambda x_: run_slabstream(x_, planes, scales, table, bm, bn, bk, g))
        rel = check(f(x), table)
        t = bench_op(f, x, iters=args.iters)
        report("slabstream", t, nbytes)
        print(f"   rel={rel:.2e}")

    if "w3wide" in variants:
        codes3 = rng.integers(0, 8, size=(k, n), dtype=np.int32)
        p3 = [jax.device_put(pp) for pp in pack_w3wide_np(codes3)]
        t3 = nf.nf_values(3)
        f = jax.jit(lambda x_: run_w3wide(x_, p3, scales, t3, bm, bn, bk, g))
        got = np.asarray(f(x), np.float32)
        w3 = np.asarray(lut_gemm.lut_qgemm_reference(
            x, jnp.asarray(codes3.astype(np.int8)), scales, t3), np.float32)
        rel = np.abs(got - w3).max() / np.abs(w3).max()
        t = bench_op(f, x, iters=args.iters)
        nb3 = k * n * 3 // 8 + (k // g) * n * 2 + x.size * 2 + m * n * 2
        report("w3wide", t, nb3)
        print(f"   rel={rel:.2e}")

    if "vmembw" in variants:
        ts = {}
        for nops in (2, 8):
            ts[nops] = run_vmembw(256, 2048, nops, 4000)
        vr = 256 * 2048 // 1024
        per_op = (ts[8] - ts[2]) / (2 * (8 - 2)) / vr
        print(f"vmembw slope: {per_op*1e9:.3f} ns/vreg/op "
              f"({per_op*940e6*1e0*1:.2f} cyc/vreg) "
              f"[t2={ts[2]*1e6:.2f}us t8={ts[8]*1e6:.2f}us]", flush=True)




    main()



# --------------------------------------------------------------------------
# slabstream: per-slab fused extract+gather+chain+merge; no full-tensor
# intermediates (tests the VMEM-traffic hypothesis: if elementwise ops cost
# a full VMEM pass each, keeping the chain in-register per [8, bn] slab
# should approach the DMA floor)
# --------------------------------------------------------------------------


def slabstream_kernel(x_ref, w_ref, s_ref, t_ref, o_ref, acc_ref, *, bk, g,
                      chunk, bn):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]
    tile = t_ref[:]
    ops = [jnp.broadcast_to(tile[:, c:c + 1], (8, bn)) for c in range(4)]
    kc = (chunk // 2) // 4  # word rows per chunk
    nslab = kc // 8

    # payload slabs in pf-row order: chunk-major, field-major, then word row
    payload = [None] * (bk // 2 // 8)
    for c in range(bk // chunk):
        for s in range(nslab):
            w8 = words[(c * kc + s * 8):(c * kc + s * 8 + 8)]
            for i in range(4):
                pf8 = (w8 >> (8 * i)) & 0xFF
                o8 = pf8 >> 4
                ge = jnp.where((pf8 & 8) != 0,
                               _gather_sublane(ops[1], pf8),
                               _gather_sublane(ops[0], pf8))
                go = jnp.where((pf8 & 128) != 0,
                               _gather_sublane(ops[3], o8),
                               _gather_sublane(ops[2], o8))
                # pf rows for (c, i, s): c*(chunk//2) + i*kc + s*8
                payload[(c * (chunk // 2) + i * kc) // 8 + s] = ge | go
    deq = pltpu.bitcast(jnp.concatenate(payload, axis=0), jnp.bfloat16)

    for gi in range(bk // g):
        part = jnp.dot(x_ref[:, gi * g:(gi + 1) * g], deq[gi * g:(gi + 1) * g],
                       preferred_element_type=jnp.float32)
        acc_ref[:] += part * s_ref[gi, :][None, :].astype(jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run_slabstream(x, planes, scales, table, bm, bn, bk, g):
    m, k = x.shape
    n = scales.shape[1]
    tile = _table_tile_scalar(table, jnp.bfloat16, 16)
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(slabstream_kernel, bk=bk, g=g, chunk=256, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // g, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(tile.shape, lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x, planes[0], scales, tile)



# --------------------------------------------------------------------------
# w3wide: single-plane 3-bit layout — 16 six-bit pair fields per 3-word
# group, planar (w0 slab | w1 slab | w2 slab) per chunk so extraction is
# contiguous-sublane; chainless 8-entry gathers, odd side one shift.
# Replaces the 2+1 dual-plane W3 (double unpack + stitch, 284 us r1).
# --------------------------------------------------------------------------


def pack_w3wide_np(codes, chunk=256):
    k, n = codes.shape
    pairs = (codes[0::2] | (codes[1::2] << 3)).astype(np.uint64)  # [K/2, N]
    p = k // 2
    cp = chunk // 2  # 128 pairs per chunk
    assert cp % 16 == 0 and p % cp == 0
    out = np.zeros((k * 3 // 32, n), np.uint32)
    pr = pairs.reshape(p // cp, 16, cp // 16, n)  # [c, j, t, n]
    ntrip = cp // 16  # triples per chunk (8)
    kc = 3 * ntrip  # words per chunk (24)
    for c in range(p // cp):
        grp = np.zeros((3, ntrip, n), np.uint64)
        for j in range(16):
            bit = 6 * j
            w, off = bit // 32, bit % 32
            grp[w] |= (pr[c, j] << off) & 0xFFFFFFFF
            if off + 6 > 32:
                grp[w + 1] |= pr[c, j] >> (32 - off)
        out[c * kc:(c + 1) * kc] = grp.reshape(kc, n).astype(np.uint32)
    return [out.view(np.int32)]


def w3wide_kernel(x_ref, w_ref, s_ref, t_ref, o_ref, acc_ref, *, bk, g,
                  chunk, bn):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]
    tile = t_ref[:]
    op_e = jnp.broadcast_to(tile[:, 0:1], (8, bn))
    op_o = jnp.broadcast_to(tile[:, 1:2], (8, bn))  # pre-shifted << 16
    cp = chunk // 2
    ntrip = cp // 16
    kc = 3 * ntrip
    out = []
    for c in range(bk // chunk):
        w = words[c * kc:(c + 1) * kc]
        ws = (w[0:ntrip], w[ntrip:2 * ntrip], w[2 * ntrip:3 * ntrip])
        for j in range(16):
            bit = 6 * j
            a, off = bit // 32, bit % 32
            if off + 6 <= 32:
                pf = (ws[a] >> off) & 0x3F
            else:
                lo = (ws[a] >> off) & ((1 << (32 - off)) - 1)
                pf = (lo | (ws[a + 1] << (32 - off))) & 0x3F
            # even idx = pf (hw wrap -> & 7); odd idx = pf >> 3
            ge = _gather_sublane(op_e, pf)
            go = _gather_sublane(op_o, pf >> 3)
            out.append(ge | go)
    deq = pltpu.bitcast(jnp.concatenate(out, axis=0), jnp.bfloat16)

    for gi in range(bk // g):
        part = jnp.dot(x_ref[:, gi * g:(gi + 1) * g], deq[gi * g:(gi + 1) * g],
                       preferred_element_type=jnp.float32)
        acc_ref[:] += part * s_ref[gi, :][None, :].astype(jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run_w3wide(x, planes, scales, table, bm, bn, bk, g):
    from flute_tpu.ops.lut_gemm import _bits16 as b16

    m, k = x.shape
    n = scales.shape[1]
    bits8 = b16(table, jnp.bfloat16)
    tile = jnp.zeros((8, 128), jnp.int32)
    tile = tile.at[:, 0].set(bits8)
    tile = tile.at[:, 1].set(bits8 << 16)
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(w3wide_kernel, bk=bk, g=g, chunk=256, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk * 3 // 32, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // g, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(tile.shape, lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x, planes[0], scales, tile)


if __name__ == "__main__":
    main()
