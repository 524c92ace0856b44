from flute_tpu.serving.engine import Engine, greedy_generate

__all__ = ["Engine", "greedy_generate"]
