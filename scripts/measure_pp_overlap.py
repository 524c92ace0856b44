"""Measure PP microbatch dispatch overlap on the virtual CPU mesh.

r2 verdict weak #3 asked for the overlap claim to be *measured*, not
asserted: steady-state decode steps through a multi-stage PipelinedModel,
whole-batch sequential vs resident-per-microbatch overlap form, same total
batch. On the CPU backend each simulated device executes on host threads,
so genuine cross-stage overlap shows up as wall-clock reduction; on real
multi-chip ICI the same dependency structure applies (stage s+1 of
microbatch m depends only on stage s of m).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/measure_pp_overlap.py
"""

import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import jax

# jax may already be imported by a sitecustomize hook that registers the
# TPU plugin — force the CPU backend on the live config (see tests/conftest)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from flute_tpu.models import llama
from flute_tpu.parallel.pp import (
    PipelinedModel,
    merge_cache_microbatches,
    split_cache_microbatches,
)


def main():
    config = llama.LlamaConfig.tiny()
    # widen the tiny config so per-stage compute is non-trivial relative to
    # dispatch overhead (still CPU-friendly)
    import dataclasses

    # dense (unquantized) params: the overlap being measured is the
    # dispatch dependency structure across stages, which is identical for
    # dense and quantized stage forwards — dense XLA matmuls keep the CPU
    # measurement out of interpreter-mode Pallas (minutes per step)
    config = dataclasses.replace(
        config, hidden_size=512, intermediate_size=1024, num_layers=8
    )
    params = llama.init_params(config, rng=0)

    stages = 4
    pm = PipelinedModel.build(
        params, config, num_stages=stages, devices=jax.devices()[:stages]
    )
    b, s, steps = 8, 64, 20

    def run_sequential():
        caches = pm.init_cache(b, s)
        tok = jnp.zeros((b, 1), jnp.int32)
        lg, caches = pm.forward(tok, caches, 0)  # warm compile
        jax.block_until_ready(lg)
        t0 = time.perf_counter()
        for i in range(steps):
            lg, caches = pm.forward(tok, caches, i + 1)
        jax.block_until_ready(lg)
        return (time.perf_counter() - t0) / steps

    def run_microbatched(m):
        caches_mb = split_cache_microbatches(pm.init_cache(b, s), m)
        tok = jnp.zeros((b, 1), jnp.int32)
        lg, caches_mb = pm.forward_microbatched(
            tok, caches_mb, 0, num_microbatches=m
        )
        jax.block_until_ready(lg)
        t0 = time.perf_counter()
        for i in range(steps):
            lg, caches_mb = pm.forward_microbatched(
                tok, caches_mb, i + 1, num_microbatches=m
            )
        jax.block_until_ready(lg)
        dt = (time.perf_counter() - t0) / steps
        # sanity: merged caches finite
        merged = merge_cache_microbatches(caches_mb)
        assert np.isfinite(np.asarray(merged[0]["k"][0], np.float32)).all()
        return dt

    t_seq = run_sequential()
    print(f"sequential whole-batch: {t_seq * 1e3:8.2f} ms/step")
    for m in (2, 4):
        t_mb = run_microbatched(m)
        print(
            f"microbatched m={m} (resident caches): {t_mb * 1e3:8.2f} ms/step "
            f"({t_seq / t_mb:.2f}x vs sequential)"
        )


if __name__ == "__main__":
    main()
