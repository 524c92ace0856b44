"""Kernel-variant laboratory: measure dequant-strategy candidates on the
real chip to guide lut_gemm design. Not part of the library — findings get
folded into flute_tpu/ops/lut_gemm.py.

Variants:
  floor     — packed-weight DMA + fake dequant (repeat+bitcast): the
              pipeline/memory floor any real dequant can approach.
  gather8   — current production path (bit-pattern OR-merge).
  gather16  — bf16 16-sublane direct-value gathers, even/odd split
              matmul streams (no OR-merge, no bitcast, no group select).
  unpack_only — shifts/masks only, no lookup (isolates unpack cost).
"""

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import flute_tpu
from flute_tpu.ops import lut_gemm
from flute_tpu.quantize import nf
from flute_tpu.utils.benchmark import bench_op

HBM = 819.0


def make_inputs(m, n, k, bits, g):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2**bits, size=(k, n), dtype=np.int32)
    # pack on HOST (tunnel uploads of the raw int32 codes are minutes);
    # only the packed planes (4 bits/weight) cross the wire.
    from flute_tpu import packing

    planes = [jax.device_put(p) for p in packing.pack_np(codes, bits)]
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // g, n)), jnp.bfloat16)
    table = nf.nf_values(bits)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    return codes, planes, scales, table, x


def report(name, t, planes, scales, x, m, n):
    byts = sum(p.size * 4 for p in planes) + scales.size * 2 + x.size * 2 + m * n * 2
    gbps = byts / t / 1e9
    print(f"{name:14s}: {t*1e6:8.1f} us  {gbps:7.1f} GB/s ({100*gbps/HBM:5.1f}%)")
    return gbps


# --------------------------------------------------------------------------
# floor: stream packed words, fake-dequant with repeat+bitcast, one matmul
# --------------------------------------------------------------------------


def floor_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, bk, g):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]  # [bk/8, bn] int32
    w4 = pltpu.repeat(w, 4, axis=0)  # [bk/2, bn]
    deq = pltpu.bitcast(w4, jnp.bfloat16)  # [bk, bn]
    acc_ref[:] += jnp.dot(x_ref[:], deq, preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run_floor(x, planes, scales, bm, bn, bk, g):
    m, k = x.shape
    n = scales.shape[1]
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(floor_kernel, bk=bk, g=g),
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
# unpack_only: real unpack, no table lookup (codes used as values)
# --------------------------------------------------------------------------


def unpack_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, bk, g, chunk):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    from flute_tpu.ops.lut_gemm import _unpack_pair_fields

    ce, co = _unpack_pair_fields([w_ref[:]], (4,), bk, chunk)
    payload = ce | (co << 16)  # fake 'lookup': reuse codes as bit patterns
    deq = pltpu.bitcast(payload, jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], deq, preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run_unpack(x, planes, scales, bm, bn, bk, g):
    m, k = x.shape
    n = scales.shape[1]
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(unpack_kernel, bk=bk, g=g, chunk=256),
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
# gather16: bf16 16-sublane value gathers, even/odd split streams
# --------------------------------------------------------------------------

_DN_SUBLANE16 = lax.GatherDimensionNumbers(
    offset_dims=(),
    collapsed_slice_dims=(0,),
    start_index_map=(0,),
    operand_batching_dims=(1,),
    start_indices_batching_dims=(1,),
)


def _gather16(op, idx):
    """out[i, j] = op[idx[i, j], j]; op [16, n] bf16, idx [16, n] int.

    Mosaic's dynamic_gather requires index bitwidth == result bitwidth,
    so indices are narrowed to int16 for a bf16 table.
    """
    return lax.gather(
        op, idx.astype(jnp.int16)[..., None], _DN_SUBLANE16, slice_sizes=(1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def gather16_kernel(
    xe_ref, xo_ref, w_ref, s_ref, t_ref, o_ref, acc_ref, *, bk, g, chunk
):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    from flute_tpu.ops.lut_gemm import _expand_scales, _unpack_pair_fields

    bn = w_ref.shape[1]
    ce, co = _unpack_pair_fields([w_ref[:]], (4,), bk, chunk)  # [bk/2, bn]
    table_bc = jnp.broadcast_to(t_ref[:, 0:1], (16, bn))  # bf16 [16, bn]
    rows = bk // 2
    ve_parts, vo_parts = [], []
    for r in range(rows // 16):
        sl = slice(r * 16, (r + 1) * 16)
        ve_parts.append(_gather16(table_bc, ce[sl]))
        vo_parts.append(_gather16(table_bc, co[sl]))
    ve = jnp.concatenate(ve_parts, axis=0)  # [bk/2, bn] bf16 (even K rows)
    vo = jnp.concatenate(vo_parts, axis=0)

    s = s_ref[:]  # [bk/g, bn]
    s_half = _expand_scales(s, g // 2, rows)  # per pair-row scale
    we = ve * s_half
    wo = vo * s_half

    acc_ref[:] += jnp.dot(xe_ref[:], we, preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(xo_ref[:], wo, preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run_gather16(x, planes, scales, table, bm, bn, bk, g):
    m, k = x.shape
    n = scales.shape[1]
    xe = x[:, 0::2]
    xo = x[:, 1::2]
    t16 = jnp.broadcast_to(
        table.astype(jnp.bfloat16)[:, None], (16, 128)
    )
    grid = (m // bm, n // bn, k // bk)
    hb = bk // 2
    return pl.pallas_call(
        functools.partial(gather16_kernel, bk=bk, g=g, chunk=256),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, hb), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, hb), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // g, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(xe, xo, planes[0], scales, t16)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--n", type=int, default=28672)
    p.add_argument("--k", type=int, default=8192)
    p.add_argument("--bn", type=int, default=2048)
    p.add_argument("--bk", type=int, default=1024)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument(
        "--variants", type=str, default="gather8,floor,unpack,gather16"
    )
    args = p.parse_args()
    m, n, k, bits, g = args.m, args.n, args.k, 4, 64
    bm = max(16, m)
    codes, planes, scales, table, x = make_inputs(m, n, k, bits, g)
    variants = args.variants.split(",")

    # correctness oracle (upload codes as int8 — 4x less tunnel traffic);
    # only computed for variants that check numerics.
    want = None
    if {"gather8", "gather16"} & set(variants):
        want = np.asarray(
            lut_gemm.lut_qgemm_reference(
                x, jnp.asarray(codes.astype(np.int8)), scales, table
            ),
            np.float32,
        )

    if "gather8" in variants:
        f = jax.jit(lambda x_: lut_gemm.lut_qgemm(
            x_, planes, scales, table, num_bits=bits, interpret=False,
            config=flute_tpu.KernelConfig(block_m=bm, block_n=args.bn, block_k=args.bk),
        ))
        got = np.asarray(f(x), np.float32)
        rel = np.abs(got - want).max() / np.abs(want).max()
        t = bench_op(f, x, iters=args.iters)
        report(f"gather8", t, planes, scales, x, m, n)
        print(f"   rel={rel:.2e}")

    if "floor" in variants:
        f = jax.jit(lambda x_: run_floor(x_, planes, scales, bm, args.bn, args.bk, g))
        f(x).block_until_ready()
        t = bench_op(f, x, iters=args.iters)
        report("floor", t, planes, scales, x, m, n)

    if "unpack" in variants:
        f = jax.jit(lambda x_: run_unpack(x_, planes, scales, bm, args.bn, args.bk, g))
        f(x).block_until_ready()
        t = bench_op(f, x, iters=args.iters)
        report("unpack_only", t, planes, scales, x, m, n)

    if "gather16" in variants:
        f = jax.jit(lambda x_: run_gather16(
            x_, planes, scales, table, bm, args.bn, args.bk, g
        ))
        got = np.asarray(f(x), np.float32)
        rel = np.abs(got - want).max() / np.abs(want).max()
        t = bench_op(f, x, iters=args.iters)
        report("gather16", t, planes, scales, x, m, n)
        print(f"   rel={rel:.2e}")

    ablations = {
        "g8_full": dict(chain=True, scale=True, wrap=False),
        "g8_nochain": dict(chain=False, scale=True, wrap=False),
        "g8_wrap": dict(chain=False, scale=True, wrap=True),
        "g8_noscale": dict(chain=True, scale=False, wrap=False),
        "g8_bare": dict(chain=False, scale=False, wrap=True),
    }
    for name, flags in ablations.items():
        if name not in variants:
            continue
        f = jax.jit(lambda x_, fl=flags: run_g8_ablate(
            x_, planes, scales, table, bm, args.bn, args.bk, g, **fl
        ))
        f(x).block_until_ready()
        t = bench_op(f, x, iters=args.iters)
        report(name, t, planes, scales, x, m, n)

    for name, mode in (("g8_repeat", "repeat"), ("g8_groupacc", "group_acc")):
        if name not in variants:
            continue
        f = jax.jit(lambda x_, md=mode: run_g8_rs(
            x_, planes, scales, table, bm, args.bn, args.bk, g, md
        ))
        got = np.asarray(f(x), np.float32)
        if want is not None:
            rel = np.abs(got - want).max() / np.abs(want).max()
            print(f"   {name} rel={rel:.2e}")
        t = bench_op(f, x, iters=args.iters)
        report(name, t, planes, scales, x, m, n)

    if "pairlut" in variants:
        cfg = flute_tpu.KernelConfig(
            block_m=bm, block_n=args.bn, block_k=args.bk, lut_mode="pair_lut"
        )
        f = jax.jit(lambda x_: lut_gemm.lut_qgemm(
            x_, planes, scales, table, num_bits=bits, interpret=False, config=cfg
        ))
        f(x).block_until_ready()
        t = bench_op(f, x, iters=args.iters)
        report("pairlut", t, planes, scales, x, m, n)

    for name, mode in (("g8_hoist", "repeat"), ("g8_hoist_ga", "group_acc")):
        if name not in variants:
            continue
        f = jax.jit(lambda x_, md=mode: run_g8_hoist(
            x_, planes, scales, table, bm, args.bn, args.bk, g, md
        ))
        got = np.asarray(f(x), np.float32)
        if want is not None:
            rel = np.abs(got - want).max() / np.abs(want).max()
            print(f"   {name} rel={rel:.2e}")
        t = bench_op(f, x, iters=args.iters)
        report(name, t, planes, scales, x, m, n)






# --------------------------------------------------------------------------
# gather8 ablations: isolate chain / concat / scale / payload costs
# --------------------------------------------------------------------------


def g8_ablate_kernel(x_ref, w_ref, s_ref, t_ref, o_ref, acc_ref, *, bk, g,
                     chunk, bn, chain, scale, wrap):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    from flute_tpu.ops.lut_gemm import (
        _expand_scales, _gather_sublane, _unpack_pair_fields,
    )

    ce, co = _unpack_pair_fields([w_ref[:]], (4,), bk, chunk)
    tile = t_ref[:]
    ngroups = 2

    def lookup(codes, col0):
        ops = [
            jnp.broadcast_to(tile[:, col0 + gg:col0 + gg + 1], (8, bn))
            for gg in range(ngroups)
        ]
        outs = []
        for r in range(codes.shape[0] // 8):
            c8 = codes[r * 8:(r + 1) * 8]
            if not chain:
                # cost model: single gather, no group select (wrong numerics
                # for codes >= 8)
                idx = c8 if wrap else (c8 & 7)
                outs.append(_gather_sublane(ops[0], idx))
            else:
                idx = c8 & 7
                res = _gather_sublane(ops[0], idx)
                res = jnp.where(c8 >= 8, _gather_sublane(ops[1], idx), res)
                outs.append(res)
        return jnp.concatenate(outs, axis=0)

    ve = lookup(ce, 0)
    vo = lookup(co, ngroups)
    payload = ve | vo
    deq = pltpu.bitcast(payload, jnp.bfloat16)
    if scale:
        s_exp = _expand_scales(s_ref[:], g, bk)
        deq = deq * s_exp
    acc_ref[:] += jnp.dot(x_ref[:], deq, preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run_g8_ablate(x, planes, scales, table, bm, bn, bk, g, **flags):
    from flute_tpu.ops.lut_gemm import _table_tile_scalar

    m, k = x.shape
    n = scales.shape[1]
    tile = _table_tile_scalar(table, jnp.bfloat16, 16)
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(
            g8_ablate_kernel, bk=bk, g=g, chunk=256, bn=bn, **flags
        ),
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
# scale-strategy variants: pltpu.repeat expand vs per-group accumulator
# --------------------------------------------------------------------------


def g8_rs_kernel(x_ref, w_ref, s_ref, t_ref, o_ref, acc_ref, *, bk, g,
                 chunk, bn, scale_mode):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    from flute_tpu.ops.lut_gemm import (
        _gather_sublane, _unpack_pair_fields,
    )

    ce, co = _unpack_pair_fields([w_ref[:]], (4,), bk, chunk)
    tile = t_ref[:]

    def lookup(codes, col0):
        ops = [
            jnp.broadcast_to(tile[:, col0 + gg:col0 + gg + 1], (8, bn))
            for gg in range(2)
        ]
        outs = []
        for r in range(codes.shape[0] // 8):
            c8 = codes[r * 8:(r + 1) * 8]
            idx = c8 & 7
            res = _gather_sublane(ops[0], idx)
            res = jnp.where(c8 >= 8, _gather_sublane(ops[1], idx), res)
            outs.append(res)
        return jnp.concatenate(outs, axis=0)

    ve = lookup(ce, 0)
    vo = lookup(co, 2)
    deq = pltpu.bitcast(ve | vo, jnp.bfloat16)  # [bk, bn]

    if scale_mode == "repeat":
        s_exp = pltpu.repeat(s_ref[:], g, axis=0)  # [bk, bn]
        w = deq * s_exp
        acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    elif scale_mode == "group_acc":
        ngroups = bk // g
        for gi in range(ngroups):
            part = jnp.dot(
                x_ref[:, gi * g:(gi + 1) * g],
                deq[gi * g:(gi + 1) * g],
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] += part * s_ref[gi, :][None, :].astype(jnp.float32)
    else:
        raise ValueError(scale_mode)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run_g8_rs(x, planes, scales, table, bm, bn, bk, g, scale_mode):
    from flute_tpu.ops.lut_gemm import _table_tile_scalar

    m, k = x.shape
    n = scales.shape[1]
    tile = _table_tile_scalar(table, jnp.bfloat16, 16)
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(
            g8_rs_kernel, bk=bk, g=g, chunk=256, bn=bn, scale_mode=scale_mode
        ),
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
# g8_hoist: slab loop contains ONLY gathers; all elementwise ops (index
# mask, range compare, select, or-merge) run as full-tensor ops, which the
# unpack ablation showed hide completely under the DMA pipeline.
# --------------------------------------------------------------------------


def g8_hoist_kernel(x_ref, w_ref, s_ref, t_ref, o_ref, acc_ref, *, bk, g,
                    chunk, bn, scale_mode):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    from flute_tpu.ops.lut_gemm import (
        _gather_sublane, _unpack_pair_fields,
    )

    ce, co = _unpack_pair_fields([w_ref[:]], (4,), bk, chunk)
    tile = t_ref[:]

    def lookup_both(codes, col0):
        idx = codes & 7          # full [bk/2, bn]
        ops = [
            jnp.broadcast_to(tile[:, col0 + gg:col0 + gg + 1], (8, bn))
            for gg in range(2)
        ]
        g0s, g1s = [], []
        for r in range(idx.shape[0] // 8):
            i8 = idx[r * 8:(r + 1) * 8]
            g0s.append(_gather_sublane(ops[0], i8))
            g1s.append(_gather_sublane(ops[1], i8))
        v0 = jnp.concatenate(g0s, axis=0)
        v1 = jnp.concatenate(g1s, axis=0)
        return jnp.where(codes >= 8, v1, v0)  # full-tensor select

    ve = lookup_both(ce, 0)
    vo = lookup_both(co, 2)
    deq = pltpu.bitcast(ve | vo, jnp.bfloat16)  # [bk, bn]

    if scale_mode == "group_acc":
        for gi in range(bk // g):
            part = jnp.dot(
                x_ref[:, gi * g:(gi + 1) * g],
                deq[gi * g:(gi + 1) * g],
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] += part * s_ref[gi, :][None, :].astype(jnp.float32)
    else:
        s_exp = pltpu.repeat(s_ref[:], g, axis=0)
        acc_ref[:] += jnp.dot(
            x_ref[:], deq * s_exp, preferred_element_type=jnp.float32
        )

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run_g8_hoist(x, planes, scales, table, bm, bn, bk, g, scale_mode):
    from flute_tpu.ops.lut_gemm import _table_tile_scalar

    m, k = x.shape
    n = scales.shape[1]
    tile = _table_tile_scalar(table, jnp.bfloat16, 16)
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(
            g8_hoist_kernel, bk=bk, g=g, chunk=256, bn=bn, scale_mode=scale_mode
        ),
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


if __name__ == "__main__":
    main()
