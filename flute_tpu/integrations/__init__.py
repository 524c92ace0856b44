from flute_tpu.integrations import checkpoint, huggingface

__all__ = ["checkpoint", "huggingface"]
