"""Kernel configuration registry for the TPU LUT-GEMM.

The TPU-native replacement for the reference's compile-time template system
(reference: flute/csrc/config.hpp:187-558 computes smem layouts / tiled MMA
shapes per template; flute/utils.py:302-344 is the template registry +
support predicate; flute/csrc/qgemm_kernel_raw_generated.cu is the
switch(template_id) dispatch). On TPU none of that machinery survives:
a config is a plain dataclass of block shapes; "instantiation" is jit
specialization of the Pallas kernel; dispatch is a dict lookup.

What *does* survive is the role: a registry of candidate configs per GEMM
shape, a validity predicate, and a stable identity (``config.key()``) that
is persisted in checkpoints the way the reference persists ``template_id``
(reference: flute/integrations/base.py:310-326).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

DEFAULT_CHUNK = 256


@dataclasses.dataclass(frozen=True)
class DeviceProfile:
    """Per-TPU-generation strategy knobs (r1 advisor: v5e constants were
    baked into code; this is the seam a v6e/v5p port calibrates — every
    value here was measured on v5e, see docs/KERNEL_NOTES.md)."""

    # block_m at/below which group-accumulator scaling beats weight-side
    # scale expansion (MXU latency-tolerant decode regime)
    group_acc_max_bm: int = 64
    # preferred block_n candidates, best first
    bn_ladder: tuple[int, ...] = (2048, 1024, 512, 256, 128)
    # preferred block_k candidates for decode (bm <= group_acc_max_bm)
    bk_ladder_decode: tuple[int, ...] = (2048, 1024, 512, 256)
    # preferred block_k candidates for prefill
    bk_ladder_prefill: tuple[int, ...] = (1024, 512, 256)
    # VMEM working-set budget for the validity predicate (bytes)
    vmem_budget: int = 24 * 1024 * 1024
    # tighter budget for 32-bit compute: Mosaic's scoped-vmem stack limit
    # is 16 MB on v5e and the f32 dequant intermediates land there
    # ("Ran out of memory in memory space vmem ... limit 16.00M", round 5)
    vmem_budget_32: int = 14 * 1024 * 1024
    # whether Mosaic supports f16 vectors on this generation (v5e does
    # not: "Unsupported type in mosaic dialect: 'f16'"); when False the
    # compiled float16 path computes in f32 and rounds once at the end
    mosaic_f16: bool = False


_PROFILES = {
    # measured calibration (kernel_lab r1/r2)
    "v5 lite": DeviceProfile(),
    # conservative defaults for untested generations: same shape logic,
    # identical until someone runs scripts/kernel_lab*.py there
    "default": DeviceProfile(),
}


def device_profile(kind: str | None = None) -> DeviceProfile:
    if kind is None:
        try:
            import jax

            kind = jax.devices()[0].device_kind
        except Exception:
            kind = "default"
    kind = kind.lower()
    for key, prof in _PROFILES.items():
        if key != "default" and key in kind:
            return prof
    return _PROFILES["default"]


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Block shapes + strategy flags for one Pallas LUT-GEMM specialization."""

    block_m: int = 16
    block_n: int = 2048
    block_k: int = 1024
    # LUT strategy (see flute_tpu/ops/lut_gemm.py):
    #   "gather8"  — even/odd 8-entry sublane gathers over bit-pattern
    #                tables, OR-merged into bf16-pair payloads (fast path);
    #   "pair_lut" — joint 2^(2b)-entry pair-payload table via 128-lane
    #                gathers (vector dequantization / HIGGS);
    #   "select"   — portable select-sum fallback.
    lut_mode: str = "gather8"
    # Pack chunk the weight layout was built with (block_k % chunk == 0).
    chunk: int = DEFAULT_CHUNK
    # Accumulation policy (role of the reference's AccumulationModeEnum
    # {Low, High, Mixed}, config.hpp:111 / conversion_utils.hpp:18-54):
    #   "high"  — f32 VMEM accumulator across K blocks (default; MXU-native);
    #   "low"   — accumulate in the compute dtype (bf16/f16) — the
    #             reference's Low mode, kept as a measured ablation
    #             (see docs/ACCUM.md); never the right choice on TPU.
    accum: str = "high"

    def key(self) -> str:
        # The `_s1` suffix is a retired split-K knob (it was never consumed
        # by the kernel; the sequential-K Mosaic pipeline covers the role of
        # the reference's Stream-K/Split-K scheduler — docs/KERNEL_NOTES.md
        # "split-K grids: no benefit"). It is still *emitted* so keys stay
        # identical to those persisted in checkpoints and registries.
        base = (
            f"m{self.block_m}n{self.block_n}k{self.block_k}"
            f"_{self.lut_mode}_c{self.chunk}_s1"
        )
        # default accum omitted so existing persisted keys stay valid
        if self.accum != "high":
            base += f"_a{self.accum}"
        return base

    @staticmethod
    def from_key(key: str) -> "KernelConfig":
        import re

        m = re.fullmatch(
            r"m(\d+)n(\d+)k(\d+)_([a-z0-9_]+?)_c(\d+)(?:_s\d+)?(?:_a([a-z0-9]+))?",
            key,
        )
        if m is None:
            raise ValueError(f"Bad KernelConfig key: {key}")
        return KernelConfig(
            block_m=int(m.group(1)),
            block_n=int(m.group(2)),
            block_k=int(m.group(3)),
            lut_mode=m.group(4),
            chunk=int(m.group(5)),
            accum=m.group(6) or "high",
        )


def is_config_supported(
    config: KernelConfig,
    m: int,
    n: int,
    k: int,
    num_bits: int,
    group_size: int,
    dtype=None,
) -> bool:
    """Validity predicate (role of reference flute/utils.py:322-344).

    TPU version checks tile divisibility and VMEM fit instead of
    tiles >= CTA count.
    """
    del m  # block_m is padded; any m works
    if config.block_k % config.chunk != 0:
        return False
    if n % config.block_n != 0:
        return False
    if k % config.block_k != 0:
        return False
    if group_size > config.block_k:
        return False
    if config.block_k % group_size != 0:
        return False
    if config.block_n % 128 != 0 or config.block_m % 8 != 0:
        return False
    # Pallas requires block sublane dims divisible by 8 unless the block
    # covers the whole array: applies to the scales block [bk/g, bn] and
    # each packed plane block [bk*pb/32, bn].
    scale_rows = config.block_k // group_size
    if scale_rows % 8 != 0 and config.block_k != k:
        return False
    from flute_tpu.bitutils import planes_for_bits

    for pb in planes_for_bits(num_bits):
        rows = config.block_k * pb // 32
        if rows % 8 != 0 and config.block_k != k:
            return False
    # Rough VMEM budget: double-buffered packed + x blocks, the dequant-path
    # intermediates, one f32 accumulator. Cap calibrated on v5e (bn=4096 x
    # bk=2048 at W4 compiles and runs; see scripts/kernel_lab.py findings).
    # 16-bit compute holds one merged [bk/2, bn] int32 payload (bitcast to
    # deq for free); 32-bit compute builds even+odd [bk/2, bn] f32 tensors
    # PLUS the row-interleaved copy — ~2x bk*bn*4 live (lut_gemm.py
    # merge16=False path; bn=2048 x bk=2048 at f32 crashes the v5e Mosaic
    # compiler while every half-size block compiles, measured round 5).
    import numpy as np

    itemsize = 2 if dtype is None else np.dtype(dtype).itemsize
    packed_bytes = config.block_k * config.block_n * num_bits // 8
    deq_factor = 1 if itemsize == 2 else 2
    deq_bytes = deq_factor * config.block_k * config.block_n * itemsize
    x_bytes = config.block_m * config.block_k * itemsize
    acc_bytes = config.block_m * config.block_n * 4
    vmem = 2 * (packed_bytes + x_bytes) + deq_bytes + acc_bytes
    prof = device_profile()
    budget = prof.vmem_budget if itemsize == 2 else prof.vmem_budget_32
    return vmem < budget


def _block_divisors(dim: int, align: int, lo: int, hi: int) -> list[int]:
    return [d for d in range(lo, min(dim, hi) + 1, align) if dim % d == 0]


def get_candidate_configs(
    m: int,
    n: int,
    k: int,
    num_bits: int,
    group_size: int,
    dtype=None,
) -> Iterator[KernelConfig]:
    """Enumerate plausible configs for a shape — the tuner's search space
    (role of the reference's template option grid,
    flute/codegen_utils.py:89-176).

    Enumerates every VMEM-legal divisor block (not just powers of two: qkv
    N=6144 admits bn=3072, down K=14336 admits bk=3584/7168), ordered by a
    measured heuristic (scripts/kernel_lab3.py r3 sweeps): configs whose
    grid has >=4 steps pipeline weight DMA properly, and among those larger
    block_k wins (fewer per-block gather/scale setup repeats); degenerate
    <4-step grids and very deep >64-step grids rank last.
    """
    # bm=16 is kept even for m<=8: on v5e the padded 16-row MXU tile
    # measured faster than bm=8 on several decode shapes (kernel_lab3 r3)
    block_ms = sorted(
        {bm for bm in (8, 16, 64, 128, 256) if bm <= max(16, _round_up(m, 8))}
    )
    cands = []
    for bm in block_ms:
        for bn in _block_divisors(n, 128, 256, 8192):
            for bk in _block_divisors(k, 256, 256, 8192):
                # No split-K dimension: the reference's Stream-K/Split-K
                # exists to fill idle SMs; on TPU the sequential-K Mosaic
                # pipeline fills equally well with a smaller block_k, and
                # K-split partials would only add a reduction pass (SURVEY
                # §2.1 "Stream-K ... dissolves"; measured in
                # docs/KERNEL_NOTES.md "split-K grids: no benefit").
                cfg = KernelConfig(block_m=bm, block_n=bn, block_k=bk)
                if is_config_supported(
                    cfg, m, n, k, num_bits, group_size, dtype=dtype
                ):
                    steps = (
                        max(1, _round_up(m, bm) // bm)
                        * (n // bn)
                        * (k // bk)
                    )
                    cands.append((steps, cfg))

    def rank(item):
        steps, cfg = item
        shallow = steps < 4  # too few steps to hide DMA behind compute
        deep = steps > 64  # per-step overhead dominates
        # larger block_m last-tie-break: one padded 16-row tile for decode,
        # full MXU tiles for prefill
        return (shallow, deep, -cfg.block_k, -cfg.block_n, -cfg.block_m)

    for _, cfg in sorted(cands, key=rank):
        yield cfg


def _round_up(x: int, mult: int) -> int:
    return (x + mult - 1) // mult * mult


def fit_config(
    config: KernelConfig,
    m: int,
    n: int,
    k: int,
    num_bits: int,
    group_size: int,
) -> KernelConfig:
    """Shrink a config's block shapes so they divide an actual (possibly
    sharded) problem shape, preserving chunk and lut_mode.

    Needed because config metadata persists with weights (like the
    reference's template_id) but the *local* shape changes under tensor
    parallelism / resharding — the reference re-tunes in that situation
    (flute/tune.py:534-591); we refit statically and let the tuner refine.
    """
    from flute_tpu.bitutils import planes_for_bits

    bn = config.block_n
    while bn > 128 and n % bn != 0:
        bn //= 2
    if n % bn != 0:
        raise ValueError(f"N={n} has no 128-multiple block divisor")

    def bk_ok(bk):
        if k % bk or bk % config.chunk or bk % group_size:
            return False
        if (bk // group_size) % 8 != 0 and bk != k:
            return False  # scales block sublane constraint
        for pb in planes_for_bits(num_bits):
            if (bk * pb // 32) % 8 != 0 and bk != k:
                return False  # packed plane block sublane constraint
        return True

    step = max(config.chunk, group_size)
    bk = config.block_k
    while bk > step and not bk_ok(bk):
        bk //= 2
    if not bk_ok(bk):
        if bk_ok(k):
            bk = k  # whole-array block is always legal
        else:
            raise ValueError(
                f"K={k} incompatible with chunk={config.chunk} "
                f"group={group_size} bits={num_bits}"
            )
    bm = min(config.block_m, _round_up(max(m, 1), 16))  # bf16 sublane tile
    if bn == config.block_n and bk == config.block_k and bm == config.block_m:
        return config
    return dataclasses.replace(config, block_m=bm, block_n=bn, block_k=bk)


def get_kernel_config(
    m: int,
    n: int,
    k: int,
    num_bits: int,
    group_size: int,
    dtype=None,
    layout: str = "auto",
) -> KernelConfig:
    """Static heuristic default config (no tuning).

    Env override FLUTE_TPU_LUT_MODE=gather8|select|pair_lut swaps the LUT
    strategy globally for ablations (role of the reference's
    FLUTE_ABLATIONS registry swap, flute/__init__.py:54-62).

    Decode (small m) is weight-bandwidth-bound: prefer large block_n/block_k
    so each weight byte is touched once and pipelining is deep. Prefill
    (large m) prefers square-ish MXU tiles.
    """
    prof = device_profile()
    bm = min(_round_up(max(m, 1), 16), 256)
    # Prefer the largest block_n dividing n (bounded), then block_k
    # (measured on v5e W4G64 decode: bn=2048/bk=2048 = 56% roofline vs 53%
    # at bk=1024; see scripts/kernel_lab.py). Ladders live in the device
    # profile so other TPU generations calibrate in one place.
    bn = 512
    for cand in prof.bn_ladder:
        if n % cand == 0:
            bn = cand
            break
    bk = 512
    bk_prefs = (
        prof.bk_ladder_decode
        if bm <= prof.group_acc_max_bm
        else prof.bk_ladder_prefill
    )
    for cand in bk_prefs:
        if k % cand == 0 and is_config_supported(
            KernelConfig(block_m=bm, block_n=bn, block_k=cand),
            m, n, k, num_bits, group_size, dtype=dtype,
        ):
            bk = cand
            break
    import os

    # The FLUTE_TPU_LUT_MODE ablation override must always win — including
    # over tuned-registry hits — or ablation runs silently measure the
    # default path (advisor finding r1).
    lut_override = os.environ.get("FLUTE_TPU_LUT_MODE")

    # a shipped tuned registry (role of the reference's
    # data/qgemm_kernel_raw_tuned_configs.pth) takes precedence over the
    # static heuristic; lazy import avoids a cycle (tune imports this module)
    if os.environ.get("FLUTE_TPU_NO_TUNED_REGISTRY") != "1":
        from flute_tpu import tune as _tune

        if dtype is None:
            hit = _tune.lookup_packaged(
                m, n, k, num_bits, group_size, layout=layout
            )
        else:
            # per-dtype entries (f16 pipelines tune separately); fall back
            # to the bf16 entry rather than the static heuristic
            hit = _tune.lookup_packaged(
                m, n, k, num_bits, group_size, dtype, layout=layout
            )
            if hit is None:
                hit = _tune.lookup_packaged(
                    m, n, k, num_bits, group_size, layout=layout
                )
        # a hit tuned under a smaller compute dtype can exceed the VMEM
        # model for this one (bf16-tuned bn2048/bk2048 crashes the f32
        # pipeline); never return a registry entry the predicate rejects
        if hit is not None and not is_config_supported(
            hit, m, n, k, num_bits, group_size, dtype=dtype
        ):
            hit = None
        if hit is not None:
            if lut_override is not None and lut_override != hit.lut_mode:
                hit = dataclasses.replace(hit, lut_mode=lut_override)
            return hit

    lut_mode = lut_override or "gather8"
    cfg = KernelConfig(block_m=bm, block_n=bn, block_k=bk, lut_mode=lut_mode)
    if not is_config_supported(cfg, m, n, k, num_bits, group_size, dtype=dtype):
        # Fall back to the smallest legal config.
        for cand in get_candidate_configs(m, n, k, num_bits, group_size, dtype=dtype):
            return cand
        raise ValueError(
            f"No supported kernel config for M={m} N={n} K={k} "
            f"bits={num_bits} group={group_size}"
        )
    return cfg
