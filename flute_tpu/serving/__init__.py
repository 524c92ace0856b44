from flute_tpu.serving.engine import Engine, greedy_generate
from flute_tpu.serving.continuous import ContinuousBatchingEngine

__all__ = ["Engine", "greedy_generate", "ContinuousBatchingEngine"]
