from flute_tpu.quantize.nf import (
    nf_values,
    nf_pivots,
    nf_quantize,
    nf_quantize_fake,
    quantize_with_table,
)
# Submodules (learnable, higgs, bitsandbytes) import flute_tpu.nn, which
# imports this package for nf — import them as submodules
# (``from flute_tpu.quantize import higgs``), not eagerly here.

__all__ = [
    "nf_values",
    "nf_pivots",
    "nf_quantize",
    "nf_quantize_fake",
    "quantize_with_table",
]
