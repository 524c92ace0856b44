"""CLI end-to-end tests: quantize -> generate, and NFL calibrate ->
quantized checkpoint (reference CLI role, base.py:370-388)."""

import dataclasses
import json
import os

import numpy as np
import pytest

safetensors = pytest.importorskip("safetensors")

from flute_tpu.integrations import cli
from flute_tpu.models import llama
from tests.test_hf_integration import _write_llama_ckpt


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    config = dataclasses.replace(llama.LlamaConfig.tiny(), rope_scaling_factor=None)
    params = llama.init_params(config, rng=0)
    d = str(tmp_path_factory.mktemp("hf"))
    _write_llama_ckpt(d, config, params)
    return d


@pytest.mark.slow
def test_cli_quantize_and_generate(hf_dir, tmp_path, capsys):
    out = str(tmp_path / "q")
    cli.main([
        "quantize", "--model-dir", hf_dir, "--output-dir", out,
        "--num-bits", "4", "--group-size", "64",
    ])
    assert os.path.exists(os.path.join(out, "flute_config.json"))

    cli.main([
        "generate", "--checkpoint", out, "--prompt", "1 5 9",
        "--max-new-tokens", "3", "--max-len", "32",
    ])
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    toks = json.loads(printed.replace("'", '"')) if printed.startswith("[") else None
    assert toks is not None and len(toks) == 3


@pytest.mark.slow
def test_cli_calibrate(hf_dir, tmp_path):
    toks = np.random.default_rng(0).integers(0, 100, 4096).astype(np.int32)
    tok_path = str(tmp_path / "toks.npy")
    np.save(tok_path, toks)
    out = str(tmp_path / "nfl")
    cli.main([
        "calibrate", "--model-dir", hf_dir, "--output-dir", out,
        "--num-bits", "4", "--group-size", "64",
        "--tokens-npy", tok_path, "--steps", "2",
        "--batch-size", "1", "--seq-len", "32",
    ])
    with open(os.path.join(out, "flute_config.json")) as f:
        sidecar = json.load(f)
    assert sidecar["model_config"]["nfl"] is True

    from flute_tpu.integrations.huggingface import load_quantized_model

    params, config, _ = load_quantized_model(out)
    from flute_tpu.nn import QuantizedLinear

    assert isinstance(params["layers"][0]["q"], QuantizedLinear)


@pytest.mark.slow
def test_cli_generate_speculative(hf_dir, tmp_path, capsys):
    """W2 draft checkpoint speculates for the W4 target; output equals the
    plain generate path (greedy invariance of speculative decoding)."""
    tgt = str(tmp_path / "w4")
    drf = str(tmp_path / "w2")
    cli.main([
        "quantize", "--model-dir", hf_dir, "--output-dir", tgt,
        "--num-bits", "4", "--group-size", "64",
    ])
    cli.main([
        "quantize", "--model-dir", hf_dir, "--output-dir", drf,
        "--num-bits", "2", "--group-size", "64",
    ])
    cli.main([
        "generate", "--checkpoint", tgt, "--prompt", "1 5 9",
        "--max-new-tokens", "5", "--max-len", "64",
    ])
    plain = capsys.readouterr().out.strip().splitlines()[-1]
    cli.main([
        "generate", "--checkpoint", tgt, "--prompt", "1 5 9",
        "--max-new-tokens", "5", "--max-len", "64",
        "--draft-checkpoint", drf, "--speculate-k", "3",
    ])
    spec = capsys.readouterr().out.strip().splitlines()[-1]
    assert spec == plain


@pytest.mark.slow
def test_cli_serve_engine_plumbing(hf_dir, tmp_path):
    """serve flag plumbing via build_serve_engine (no port bound): default
    -> continuous engine; --paged --pool-prefill -> PagedEngine with pool
    prefill; + --draft-checkpoint -> PagedSpeculativeEngine. Each engine
    actually decodes a few tokens."""
    from flute_tpu.serving import (
        ContinuousBatchingEngine,
        PagedEngine,
        PagedSpeculativeEngine,
    )

    tgt = str(tmp_path / "w4")
    drf = str(tmp_path / "w2")
    cli.main([
        "quantize", "--model-dir", hf_dir, "--output-dir", tgt,
        "--num-bits", "4", "--group-size", "64",
    ])
    cli.main([
        "quantize", "--model-dir", hf_dir, "--output-dir", drf,
        "--num-bits", "2", "--group-size", "64",
    ])
    p = cli.build_parser()

    def build(extra):
        args = p.parse_args(
            ["serve", "--checkpoint", tgt, "--num-slots", "2",
             "--max-len", "64", "--block-size", "8", "--num-blocks", "12"]
            + extra
        )
        return cli.build_serve_engine(args)[0]

    eng = build([])
    assert isinstance(eng, ContinuousBatchingEngine)

    eng = build(["--paged", "--pool-prefill"])
    assert isinstance(eng, PagedEngine) and eng.pool_prefill
    eng.submit([1, 5, 9], max_new_tokens=3)
    out = eng.run()
    assert len(out[0]) == 3

    eng = build(["--paged", "--draft-checkpoint", drf, "--speculative-k", "2"])
    assert isinstance(eng, PagedSpeculativeEngine) and eng.k == 2
    eng.submit([1, 5, 9], max_new_tokens=3)
    out = eng.run()
    assert len(out[0]) == 3

    with pytest.raises(SystemExit):
        build(["--draft-checkpoint", drf])  # requires --paged
