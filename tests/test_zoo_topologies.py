"""Structural checks over the full model zoo x TP table (reference
README.md:244-249 'supported models x TP'): every documented topology must
divide cleanly through heads, pack chunks and kernel blocks — no hardware
needed."""

import pytest

from flute_tpu import shapes
from flute_tpu.models import gemma2, llama
from flute_tpu.ops.kernel_config import get_kernel_config
from flute_tpu.packing import DEFAULT_CHUNK

CONFIGS = {
    "llama3-8b": llama.LlamaConfig.llama31_8b(),
    "llama3-70b": llama.LlamaConfig.llama31_70b(),
    "llama3-405b": llama.LlamaConfig.llama31_405b(),
    "gemma2-9b": gemma2.Gemma2Config.gemma2_9b(),
    "gemma2-27b": gemma2.Gemma2Config.gemma2_27b(),
}


@pytest.mark.parametrize("model", list(shapes.MODEL_TP))
def test_tp_divisibility(model):
    config = CONFIGS[model]
    for tp in shapes.MODEL_TP[model]:
        assert config.num_heads % tp == 0, (model, tp)
        assert config.num_kv_heads % tp == 0, (model, tp)
        for s in shapes.iter_shapes(models=(model,), tps=(tp,)):
            # sharded K must stay chunk- and group-aligned; sharded N must
            # keep at least one 128-lane block
            assert s.k % DEFAULT_CHUNK == 0, s
            assert s.k % 64 == 0, s
            assert s.n % 128 == 0, s


@pytest.mark.parametrize("model", list(shapes.MODELS))
def test_kernel_config_exists_for_every_zoo_shape(model):
    for s in shapes.iter_shapes(models=(model,)):
        for bits in (2, 3, 4):
            cfg = get_kernel_config(8, s.n, s.k, bits, 64)
            assert cfg.block_n <= s.n and cfg.block_k <= s.k


def test_shape_registry_matches_configs():
    """The derived shape registry must agree with the model configs (no
    drift — the reference's hand-listed shapes.py cannot guarantee this)."""
    c = CONFIGS["llama3-70b"]
    got = {(s.proj, s.n, s.k) for s in shapes.iter_shapes(models=("llama3-70b",), tps=(1,))}
    qdim = c.num_heads * c.head_dim
    kvdim = c.num_kv_heads * c.head_dim
    assert ("q", qdim, c.hidden_size) in got
    assert ("down", c.hidden_size, c.intermediate_size) in got
    assert ("k", kvdim, c.hidden_size) in got
