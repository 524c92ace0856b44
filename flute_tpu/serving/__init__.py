from flute_tpu.serving.engine import Engine, greedy_generate
from flute_tpu.serving.continuous import ContinuousBatchingEngine, SamplingParams
from flute_tpu.serving.paged import PagedEngine
from flute_tpu.serving.paged_spec import PagedSpeculativeEngine
from flute_tpu.serving.speculative import SpeculativeEngine

__all__ = [
    "Engine",
    "greedy_generate",
    "ContinuousBatchingEngine",
    "SamplingParams",
    "PagedEngine",
    "PagedSpeculativeEngine",
    "SpeculativeEngine",
]
