"""Perplexity evaluation — the quality metric of the reference's model zoo
(Wiki/C4 PPL tables, reference README.md:143-152 / BASELINE.md).

``perplexity`` scores any token stream against any flute-tpu model
(quantized or dense, Llama or Gemma-2) with the standard sliding-window
protocol: non-overlapping windows of ``seq_len``, next-token NLL averaged
over all scored positions. ``wikitext2_tokens`` fetches the standard
corpus when `datasets` + a tokenizer are available (gated import — the
environment has no egress; pass your own tokens otherwise).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu.models import llama


def _nll_fn(config, forward, seq_len: int):
    @jax.jit
    def nll(params, tokens):  # [B, seq_len]
        b = tokens.shape[0]
        cache = llama_init_cache_like(config, b, seq_len)
        logits, _ = forward(params, config, tokens[:, :-1], cache, jnp.int32(0))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll), nll.size

    return nll


def llama_init_cache_like(config, batch: int, max_len: int):
    """Cache constructor dispatch (LlamaConfig vs Gemma2Config)."""
    if type(config).__name__ == "Gemma2Config":
        from flute_tpu.models import gemma2

        return gemma2.init_cache(config, batch, max_len)
    return llama.init_cache(config, batch, max_len)


def perplexity(
    params: Any,
    config: Any,
    token_ids,
    *,
    forward: Optional[Callable] = None,
    seq_len: int = 2048,
    batch_size: int = 1,
) -> float:
    """Sliding-window perplexity of ``token_ids`` (1-D array-like)."""
    if forward is None:
        if type(config).__name__ == "Gemma2Config":
            from flute_tpu.models import gemma2

            forward = gemma2.forward
        else:
            forward = llama.forward
    ids = np.asarray(token_ids, np.int32).reshape(-1)
    n_windows = len(ids) // seq_len
    if n_windows == 0:
        raise ValueError(f"need at least {seq_len} tokens, got {len(ids)}")
    windows = ids[: n_windows * seq_len].reshape(n_windows, seq_len)

    nll = _nll_fn(config, forward, seq_len)
    nll1 = nll if batch_size == 1 else _nll_fn(config, forward, seq_len)
    total, count = 0.0, 0
    full = (n_windows // batch_size) * batch_size
    for i in range(0, full, batch_size):
        s, c = nll(params, jnp.asarray(windows[i:i + batch_size]))
        total += float(s)
        count += int(c)
    for row in windows[full:]:  # remainder rows scored at batch 1
        s, c = nll1(params, jnp.asarray(row[None]))
        total += float(s)
        count += int(c)
    return float(np.exp(total / count))


def wikitext2_tokens(tokenizer_path: str, split: str = "test"):
    """Tokenize wikitext-2 with a HF tokenizer (requires `datasets` and
    network/cached data; reference calibration corpus, learnable.py:100+)."""
    from datasets import load_dataset  # gated: not available offline
    from transformers import AutoTokenizer

    ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
    tok = AutoTokenizer.from_pretrained(tokenizer_path)
    text = "\n\n".join(ds["text"])
    return np.asarray(tok(text)["input_ids"], np.int32)
