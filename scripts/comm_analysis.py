"""Multi-host serving communication-volume / overlap analysis.

The ≥80%-multi-host-scaling north star (BASELINE.json) cannot be measured
in this environment (one real chip); this script makes the claim
*quantitative* instead of "compiles and is finite" (r2 verdict missing #6):
for a given model/topology it computes, from the same partition specs the
runtime uses (flute_tpu.parallel.tp), the exact bytes every collective
moves per decode step, compares them with the per-step compute floor, and
reports where the topology stops scaling.

Bandwidth model (override via flags — link speeds differ per deployment;
defaults are deliberately conservative, labeled assumptions, NOT
measurements):
  * ICI: effective all-reduce bus bandwidth per chip within a slice.
    TPU v5e has 4 ICI links/chip in a 2-D torus; we default to 45 GB/s
    effective per-chip all-reduce bandwidth.
  * DCN: inter-slice (host) network; default 6.25 GB/s/chip (50 Gbps).

Key structural facts the analysis rests on (see flute_tpu/parallel/tp.py):
  * Megatron TP needs exactly 2 all-reduces per decoder block per step
    (after o-proj and after down-proj), each over the activation
    [B, T, hidden] in bf16 — INDEPENDENT of tp width in volume per chip
    (ring all-reduce moves 2*(tp-1)/tp * bytes ≈ 2 * bytes).
  * With dp across DCN (make_hybrid_mesh), serving decode needs NO
    per-step DCN traffic at all — requests are partitioned, not sharded;
    DCN carries only request/response text. Multi-host serving scaling is
    therefore embarrassingly parallel BY CONSTRUCTION and the ≥80% bar
    reduces to single-slice TP efficiency.
  * TP×PP adds one activation hand-off [B, T, hidden] per stage boundary
    per microbatch (pipeline, not a collective).

Usage:
  python scripts/comm_analysis.py --model 70b --tp 4 --batch 8
  python scripts/comm_analysis.py --model 405b --tp 8 --pp 2 --batch 8 --markdown
"""

import argparse
import dataclasses


@dataclasses.dataclass
class ModelDims:
    name: str
    hidden: int
    intermediate: int
    layers: int
    heads: int
    kv_heads: int
    head_dim: int = 128
    vocab: int = 128256


MODELS = {
    "8b": ModelDims("Llama-3.1-8B", 4096, 14336, 32, 32, 8),
    "70b": ModelDims("Llama-3.1-70B", 8192, 28672, 80, 64, 8),
    "405b": ModelDims("Llama-3.1-405B", 16384, 53248, 126, 128, 8),
}


def analyze(m: ModelDims, tp: int, pp: int, batch: int, bits: float,
            hbm_gbps: float, ici_gbps: float, dcn_gbps: float,
            microbatches: int = 1):
    dt = 2  # bf16 activation bytes
    # --- weights per chip (packed) ---
    qdim = m.heads * m.head_dim
    kvdim = m.kv_heads * m.head_dim
    layer_params = (
        m.hidden * (qdim + 2 * kvdim)      # qkv
        + qdim * m.hidden                  # o
        + 2 * m.hidden * m.intermediate    # gate_up
        + m.intermediate * m.hidden        # down
    )
    weight_bytes_chip = layer_params * m.layers * (bits / 8) / (tp * pp)

    # --- per-decode-step compute floor: every weight byte read once ---
    t_weights = weight_bytes_chip / (hbm_gbps * 1e9)

    # --- TP collectives per step: 2 all-reduce([B,1,hidden] bf16)/block ---
    act = batch * 1 * m.hidden * dt
    ar_bytes = 2 * (tp - 1) / tp * act       # ring all-reduce per chip
    layers_per_stage = m.layers // pp
    t_tp = 2 * layers_per_stage * ar_bytes / (ici_gbps * 1e9) if tp > 1 else 0.0

    # --- PP hand-off per step: one activation per boundary per microbatch ---
    t_pp = (pp - 1) * microbatches * act / (ici_gbps * 1e9) if pp > 1 else 0.0

    # --- DCN per step for dp-across-hosts serving: zero by construction ---
    t_dcn = 0.0

    t_step = t_weights + t_tp + t_pp + t_dcn
    eff = t_weights / t_step
    return {
        "model": m.name, "tp": tp, "pp": pp, "batch": batch, "bits": bits,
        "weight_gb_chip": weight_bytes_chip / 1e9,
        "t_weights_us": t_weights * 1e6,
        "tp_allreduce_mb_step": 2 * layers_per_stage * ar_bytes / 1e6,
        "t_tp_us": t_tp * 1e6,
        "t_pp_us": t_pp * 1e6,
        "t_dcn_us": t_dcn,
        "t_step_us": t_step * 1e6,
        "scaling_eff_pct": 100 * eff,
        "tok_s_chip": batch / t_step,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="70b", choices=list(MODELS))
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--pp", type=int, default=1)
    ap.add_argument("--microbatches", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bits", type=float, default=4)
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="per-chip HBM bandwidth (v5e)")
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="ASSUMED effective per-chip all-reduce ICI bandwidth")
    ap.add_argument("--dcn-gbps", type=float, default=6.25,
                    help="ASSUMED per-chip DCN bandwidth (50 Gbps)")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()
    r = analyze(MODELS[args.model], args.tp, args.pp, args.batch, args.bits,
                args.hbm_gbps, args.ici_gbps, args.dcn_gbps, args.microbatches)
    if args.markdown:
        print(f"| {r['model']} | tp={r['tp']} pp={r['pp']} B={r['batch']} "
              f"W{args.bits:g} | {r['weight_gb_chip']:.2f} GB/chip | "
              f"{r['tp_allreduce_mb_step']:.2f} MB/step | "
              f"{r['t_weights_us']:.0f} + {r['t_tp_us']:.0f} + "
              f"{r['t_pp_us']:.0f} µs | {r['scaling_eff_pct']:.1f}% | "
              f"{r['tok_s_chip']:.0f} |")
    else:
        for k, v in r.items():
            print(f"  {k:22s} {v if isinstance(v, str) else round(v, 2)}")


if __name__ == "__main__":
    main()
