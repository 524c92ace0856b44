from flute_tpu.models import gemma2, llama

__all__ = ["gemma2", "llama"]
