"""Per-shape kernel-config auto-tuning with persisted metadata.

Role-equivalent of the reference's ``flute/tune.py``: benchmark every
candidate config for a GEMM shape, pick the fastest, persist the choice
next to the weights, and re-fit when the deployment shape changes
(``tune_and_pack`` tune.py:395-474, ``maybe_tune_and_repack``
tune.py:534-591, ``TuneMetaData`` tune.py:30-52).

Key structural simplification the TPU design buys: the pack layout depends
only on the *chunk*, not on the kernel block shapes — so re-tuning NEVER
requires repacking (the reference must unpack→repack because its layout is
template-specific). ``maybe_retune`` just swaps ``config_key``.

Timing uses the serialized-fori_loop device benchmark
(flute_tpu/utils/benchmark.py), the tunnel-safe analogue of the reference's
``triton.testing.do_bench`` (tune.py:82-109). Correctness verification of
the chosen config keeps the reference's two oracles (identity = bit-exact,
random = threshold; tune.py:294-392).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu import packing
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.kernel_config import (
    KernelConfig,
    get_candidate_configs,
    get_kernel_config,
)
from flute_tpu.utils.benchmark import bench_op

# Reference thresholds (tests/kernel.py:12-13, tune.py:13-14).
RTOL = {"float16": 2.0e-3, "bfloat16": 1.1e-2, "float32": 1.0e-5}

_VERSION = "v1"


@dataclasses.dataclass(frozen=True)
class TuneMetaData:
    """Persisted tuning identity (reference tune.py:30-52): enough to know
    whether a stored config still applies to the current deployment."""

    version: str
    m: int
    n: int
    k: int
    num_bits: int
    group_size: int
    dtype: str
    device_kind: str
    config_key: str
    # packed layout the config was tuned for ("auto" covers the classic
    # layouts; "w4sym" is a distinct kernel) — absent in pre-r4 metadata
    layout: str = "auto"

    def to_json(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_json(d: dict) -> "TuneMetaData":
        return TuneMetaData(**d)


def _bits_key(num_bits, layout: str = "auto"):
    """Registry encoding of (num_bits, layout). The w4sym layout shares
    num_bits=4 but is a different kernel with different optimal blocks, so
    it tunes and persists under the marker "4s". (3-bit needs no marker:
    the wide layout is what the tuner packs and production ships.)"""
    if layout == "w4sym":
        if num_bits != 4:
            raise ValueError("layout='w4sym' requires num_bits=4")
        return "4s"
    return num_bits


def _memo_key(m, n, k, num_bits, group_size, dtype, device_kind, layout="auto"):
    # Like the reference, decode shapes below one tile share a key
    # (tune.py:192-202 uses max(M, 16)).
    return (
        _VERSION, max(m, 16), n, k, _bits_key(num_bits, layout), group_size,
        str(dtype), device_kind,
    )


_MEMO: dict[tuple, KernelConfig] = {}


def _device_kind() -> str:
    return jax.devices()[0].device_kind


def _host_oracle(
    x: np.ndarray, codes: np.ndarray, scales: np.ndarray, table: np.ndarray,
    dtype,
) -> np.ndarray:
    """Host-side f32 ground truth with operands rounded to ``dtype`` first —
    the tuner's verification oracle. No device upload of the (large) codes
    array is needed because the tuner generated them on the host."""
    import ml_dtypes

    np_dt = {"bfloat16": ml_dtypes.bfloat16, "float16": np.float16,
             "float32": np.float32}[jnp.dtype(dtype).name]
    t = table.astype(np_dt).astype(np.float32)
    g = codes.shape[0] // scales.shape[0]
    s = np.repeat(scales.astype(np_dt).astype(np.float32), g, axis=0)
    deq = (t[codes].astype(np_dt).astype(np.float32) * s).astype(np_dt)
    xr = x.astype(np_dt).astype(np.float32)
    return xr @ deq.astype(np.float32)


def pick_verified(
    timed: Sequence[tuple[float, KernelConfig]],
    verify_fn,
) -> tuple[Optional[KernelConfig], float]:
    """Walk candidates fastest-first and return the first that passes
    verification — the reference re-verifies its chosen template inside every
    tune_and_pack (flute/tune.py:294-392); a mis-compiling candidate must
    never be silently selected."""
    for t, cfg in sorted(timed, key=lambda p: p[0]):
        try:
            if verify_fn(cfg):
                return cfg, t
        except Exception as e:
            # verification of one candidate must not kill the sweep, but a
            # silent swallow hides systematic failures (e.g. a transient
            # chip error failing every candidate) — surface one line
            print(
                f"    verify {cfg.key()} raised: "
                f"{(str(e).splitlines() or [type(e).__name__])[0][:120]}",
                flush=True,
            )
            continue
    return None, float("inf")


def tune_config(
    m: int,
    n: int,
    k: int,
    num_bits: int,
    group_size: int,
    dtype=jnp.bfloat16,
    *,
    max_candidates: int = 24,
    iters: int = 30,
    use_memo: bool = True,
    verify: bool = True,
    verbose: bool = False,
    layout: str = "auto",
) -> KernelConfig:
    """Benchmark candidate configs for (M, N, K, b, g, dtype) on the current
    device, verify the winner against a host oracle, and return the fastest
    *verified* config (reference _tune + check, tune.py:205-257,294-392)."""
    kind = _device_kind()
    key = _memo_key(
        m, n, k, num_bits, group_size, jnp.dtype(dtype).name, kind, layout
    )
    if use_memo and key in _MEMO:
        return _MEMO[key]
    if jax.default_backend() == "cpu":
        # Interpreter timings are meaningless; use the static heuristic.
        cfg = get_kernel_config(m, n, k, num_bits, group_size, dtype=dtype)
        _MEMO[key] = cfg
        return cfg

    rng = np.random.default_rng(0)
    # Generate codes/scales/x ON DEVICE and pack under jit: the dev tunnel
    # moves arrays at single-digit MB/s, so host-packing + device_put of
    # zoo-shape planes (~100 MB at N28672 K8192) would dominate every
    # registry-marathon pass by an hour per shape.
    kc, ks, kx = jax.random.split(jax.random.PRNGKey(0), 3)
    codes = jax.jit(
        lambda key: jax.random.randint(key, (k, n), 0, 2**num_bits, jnp.int32)
    )(kc)
    # tune the layout production uses: 3-bit ships the wide single-plane
    # layout by default; 4-bit with layout="w4sym" ships the sign-symmetric
    # byte-field layout (nn.py quantize path; docs/KERNEL_NOTES.md)
    if layout == "w4sym":
        raw = jax.jit(packing.pack_w4_sym_jnp)(codes)
        # sign-magnitude-ordered symmetric table (the layout contract)
        mags = np.sort(np.abs(rng.standard_normal(2 ** (num_bits - 1))))
        table_np = np.concatenate([mags, -mags]).astype(np.float32)
    else:
        if num_bits == 3:
            raw = jax.jit(packing.pack_w3_wide_jnp)(codes)
        else:
            raw = jax.jit(
                lambda c, _b=num_bits: packing.pack_jnp(c, _b)
            )(codes)
        table_np = np.sort(rng.standard_normal(2**num_bits)).astype(np.float32)
    planes = [p.block_until_ready() for p in raw]
    scales = jax.jit(
        lambda key: jax.random.uniform(
            key, (k // group_size, n), jnp.float32, 0.5, 1.5
        ).astype(dtype)
    )(ks)
    table = jnp.asarray(table_np, jnp.float32)
    x = jax.jit(
        lambda key: jax.random.normal(key, (m, k), jnp.float32).astype(dtype)
    )(kx)

    candidates = list(
        get_candidate_configs(m, n, k, num_bits, group_size, dtype=dtype)
    )
    # The enumeration order is the measured-heuristic ranking
    # (kernel_config.get_candidate_configs); keep the static default in the
    # pool even when the cap would cut it.
    default = get_kernel_config(m, n, k, num_bits, group_size, dtype=dtype)
    candidates = candidates[:max_candidates]
    if default.key() not in {c.key() for c in candidates}:
        candidates.append(default)

    fns = {}
    timed = []
    for ci, cfg in enumerate(candidates):
        if verbose:
            # one line per candidate so an outer watchdog (e.g.
            # scripts/registry_marathon.sh) can distinguish a slow-but-live
            # sweep from a wedged tunnel compile by log growth
            print(
                f"    cand {ci + 1}/{len(candidates)} {cfg.key()} ...",
                flush=True,
            )
        try:
            def f(x_, planes_=planes, scales_=scales, table_=table, c=cfg):
                return lut_gemm.lut_qgemm(
                    x_, planes_, scales_, table_, num_bits=num_bits,
                    config=c, interpret=False, layout=layout,
                )

            t = bench_op(f, x, iters=iters)
        except Exception:
            continue  # unsupported on this chip — skip, like tune.py:160-167
        fns[cfg.key()] = f
        timed.append((t, cfg))
        if verbose:
            print(f"      {t * 1e6:9.1f} us", flush=True)

    # Re-measure the screening top 3 best-of-2 at a longer window: single
    # slope measurements carry residual tunnel noise, enough to swap close
    # candidates. (bench_op's adaptive window already guarantees the
    # screening deltas dominate RTT jitter, so this pass is confirmation,
    # not rescue — top-5 best-of-3 was half the per-entry tuning cost.)
    if len(timed) > 1:
        timed.sort(key=lambda p: p[0])
        refined = []
        for ri, (t_scr, cfg) in enumerate(timed[:3]):
            if verbose:
                # keep the log growing: the registry-marathon watchdog
                # kills on silence, and refine+verify can take minutes
                print(f"    refine {ri + 1}/3 {cfg.key()} ...", flush=True)
            f = fns[cfg.key()]
            try:
                t = min(bench_op(f, x, iters=2 * iters) for _ in range(2))
            except Exception:
                t = t_scr
            refined.append((t, cfg))
            if verbose:
                print(f"      {t * 1e6:9.1f} us", flush=True)
        timed = refined + timed[3:]

    if not timed:
        _MEMO[key] = default
        return default

    if verify:
        # On-device jnp oracle (same contract as verify_config): dequantize
        # via plain XLA gather + matmul, entirely independent of the Pallas
        # kernel under test, and only a scalar crosses the tunnel. The host
        # numpy oracle (_host_oracle) stays for the test suite, where shapes
        # are small enough to move.
        thr = 2.0 * RTOL[jnp.dtype(dtype).name]

        # Operands MUST be jit arguments, not closures: a closed-over
        # device array is embedded in the compiled program as a constant,
        # and zoo-size codes (~0.5 GB at N28672) blow the remote-compile
        # request limit (HTTP 413, round 5).
        @jax.jit
        def _rel_err(got, x_, codes_, scales_, table_):
            want = lut_gemm.lut_qgemm_reference(x_, codes_, scales_, table_)
            denom = jnp.maximum(jnp.abs(want.astype(jnp.float32)).max(), 1e-6)
            diff = jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32)
            ).max()
            return diff / denom

        def _ok(cfg):
            if verbose:
                print(f"    verify {cfg.key()} ...", flush=True)
            ok = float(
                _rel_err(fns[cfg.key()](x), x, codes, scales, table)
            ) <= thr
            if verbose:
                print(f"      {'pass' if ok else 'FAIL'}", flush=True)
            return ok

        best, _ = pick_verified(timed, _ok)
        if best is None:
            raise AssertionError(
                f"no candidate config passed verification for "
                f"M={m} N={n} K={k} b={num_bits} g={group_size}"
            )
    else:
        best = min(timed, key=lambda p: p[0])[1]
    _MEMO[key] = best
    return best


def verify_config(
    config: KernelConfig,
    n: int = 1024,
    k: int = 1024,
    num_bits: int = 4,
    group_size: int = 64,
    dtype=jnp.bfloat16,
    seeds: Sequence[int] = (0, 1),
) -> None:
    """Reference-style post-tune correctness check (tune.py:294-392):
    identity input must reconstruct bit-exactly; random input must match the
    XLA oracle within the dtype threshold. Raises on failure."""
    for seed in seeds:
        rng = np.random.default_rng(seed)
        codes = rng.integers(0, 2**num_bits, size=(k, n), dtype=np.int32)
        planes = packing.pack(codes, num_bits, chunk=config.chunk)
        scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // group_size, n)), dtype)
        table = jnp.asarray(np.sort(rng.standard_normal(2**num_bits)), jnp.float32)

        eye = jnp.eye(k, dtype=dtype)
        got = lut_gemm.lut_qgemm(
            eye, planes, scales, table, num_bits=num_bits, config=config
        )
        want = lut_gemm.dequantize_codes(jnp.asarray(codes), scales, table, dtype)
        if not np.array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        ):
            raise AssertionError(f"identity oracle failed for {config.key()}")

        x = jnp.asarray(rng.standard_normal((33, k)), dtype)
        got = lut_gemm.lut_qgemm(
            x, planes, scales, table, num_bits=num_bits, config=config
        )
        want = lut_gemm.lut_qgemm_reference(x, jnp.asarray(codes), scales, table)
        err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
        denom = max(float(jnp.abs(want).max()), 1e-6)
        thr = RTOL[jnp.dtype(dtype).name]
        if err.max() / denom > thr:
            raise AssertionError(
                f"random oracle failed for {config.key()}: "
                f"rel={err.max() / denom:.2e} > {thr}"
            )


def tune_linear(layer, m: int, dtype=jnp.bfloat16, **kw):
    """Retune a QuantizedLinear's config for batch size ``m``. No repack is
    ever needed (layout is block-shape independent) — the TPU answer to the
    reference's maybe_tune_and_repack (tune.py:534-591)."""
    kw.setdefault("layout", getattr(layer, "layout", "auto"))
    cfg = tune_config(
        m, layer.out_features, layer.in_features, layer.num_bits,
        layer.group_size, dtype, **kw,
    )
    if cfg.chunk != (layer.config.chunk if layer.config else packing.DEFAULT_CHUNK):
        cfg = dataclasses.replace(
            cfg, chunk=layer.config.chunk if layer.config else packing.DEFAULT_CHUNK
        )
    return layer.with_config(cfg)


def metadata_for(layer, m: int, dtype=jnp.bfloat16) -> TuneMetaData:
    return TuneMetaData(
        version=_VERSION,
        m=m,
        n=layer.out_features,
        k=layer.in_features,
        num_bits=layer.num_bits,
        group_size=layer.group_size,
        dtype=jnp.dtype(dtype).name,
        device_kind=_device_kind(),
        config_key=layer.config_key or "",
        layout=getattr(layer, "layout", "auto"),
    )


def maybe_retune(layer, meta: TuneMetaData, m: int, dtype=jnp.bfloat16):
    """If the persisted tuning no longer matches the deployment (batch size
    or device changed), retune; otherwise restore the stored config
    (reference maybe_tune_and_repack semantics, tune.py:534-591)."""
    same = (
        meta.version == _VERSION
        and max(meta.m, 16) == max(m, 16)
        and meta.device_kind == _device_kind()
        and meta.dtype == jnp.dtype(dtype).name
        and meta.layout == getattr(layer, "layout", "auto")
    )
    if same and meta.config_key:
        return layer.with_config(KernelConfig.from_key(meta.config_key))
    return tune_linear(layer, m, dtype)


# ---------------------------------------------------------------------------
# Registry persistence (replaces the reference's pickled
# flute/data/qgemm_kernel_raw_tuned_configs.pth with readable JSON)
# ---------------------------------------------------------------------------


_PACKAGED = os.path.join(os.path.dirname(__file__), "data", "tuned_configs.json")
_packaged_loaded = False


def lookup_packaged(
    m: int, n: int, k: int, num_bits: int, group_size: int,
    dtype=jnp.bfloat16, layout: str = "auto",
) -> Optional[KernelConfig]:
    """Consult the registry shipped with the package (and anything already
    tuned this process) without triggering a tuning sweep. Keys match on
    device kind, so entries tuned on one chip generation never leak onto
    another."""
    global _packaged_loaded
    if not _packaged_loaded:
        _packaged_loaded = True
        try:
            load_registry(_PACKAGED)
        except Exception:
            pass
    try:
        kind = _device_kind()
    except Exception:
        return None
    key = _memo_key(
        m, n, k, num_bits, group_size, jnp.dtype(dtype).name, kind, layout
    )
    return _MEMO.get(key)


def save_registry(path: str) -> None:
    data = {
        "|".join(map(str, k)): v.key() for k, v in _MEMO.items()
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)


def load_registry(path: str) -> int:
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        data = json.load(f)
    n = 0
    for k, v in data.items():
        parts = k.split("|")
        # bits field is an int for standard layouts, a marker string for
        # layout-variant kernels ("4s" = w4sym; see _bits_key)
        bits = int(parts[4]) if parts[4].isdigit() else parts[4]
        key = (
            parts[0], int(parts[1]), int(parts[2]), int(parts[3]),
            bits, int(parts[5]), parts[6], parts[7],
        )
        _MEMO[key] = KernelConfig.from_key(v)
        n += 1
    return n
