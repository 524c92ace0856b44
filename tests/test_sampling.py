"""Sampling utility tests (temperature / top-k / top-p)."""

import jax
import jax.numpy as jnp
import numpy as np

from flute_tpu.serving.engine import sample_logits


def _logits():
    # V=8 with a clear ordering: index i has logit i
    return jnp.asarray(np.arange(8, dtype=np.float32)[None, :].repeat(4, 0))


def test_greedy_at_zero_temperature():
    out = sample_logits(jax.random.PRNGKey(0), _logits(), temperature=0.0)
    assert np.all(np.asarray(out) == 7)


def test_top_k_restricts_support():
    rng = jax.random.PRNGKey(1)
    seen = set()
    for i in range(50):
        rng, sub = jax.random.split(rng)
        out = sample_logits(sub, _logits(), temperature=5.0, top_k=3)
        seen.update(np.asarray(out).tolist())
    assert seen <= {5, 6, 7}, seen


def test_top_p_restricts_support():
    # peaked distribution: top_p=0.9 keeps only the first few tokens
    logits = jnp.asarray(
        np.log(np.asarray([0.6, 0.3, 0.05, 0.03, 0.02]))[None, :], jnp.float32
    )
    rng = jax.random.PRNGKey(2)
    seen = set()
    for _ in range(100):
        rng, sub = jax.random.split(rng)
        out = sample_logits(sub, logits, temperature=1.0, top_p=0.9)
        seen.update(np.asarray(out).tolist())
    assert seen <= {0, 1}, seen


def test_sampling_respects_distribution():
    logits = jnp.asarray(np.log(np.asarray([0.9, 0.1]))[None, :], jnp.float32)
    rng = jax.random.PRNGKey(3)
    counts = [0, 0]
    for _ in range(200):
        rng, sub = jax.random.split(rng)
        counts[int(sample_logits(sub, logits, 1.0)[0])] += 1
    assert counts[0] > 140
