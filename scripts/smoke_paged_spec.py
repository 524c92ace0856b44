"""On-chip smoke for the paged serving stack (ROADMAP on-chip queue).

Exercises under real Mosaic (not interpret mode):
  - PagedEngine greedy decode vs the dense-cache Engine oracle,
  - PagedSpeculativeEngine (fused multi-query `paged_verify_attention`,
    one DMA per block for all k+1 queries) — output must equal plain
    paged greedy decode exactly,
  - pool-backed chunked prefill path.

Run: PYTHONPATH=. python -u scripts/smoke_paged_spec.py
"""

import time

import jax

from flute_tpu.models import llama
from flute_tpu.serving.engine import Engine
from flute_tpu.serving.paged import PagedEngine
from flute_tpu.serving.paged_spec import PagedSpeculativeEngine

print("devices:", jax.devices())
assert jax.default_backend() == "tpu", "this smoke must run on the TPU"

config = llama.LlamaConfig.tiny()
params = llama.init_params(config, rng=0)
qparams = llama.quantize_model(params, num_bits=4, group_size=64)

prompts = [[3, 17, 42, 9], [11, 5]]
n = 8

t0 = time.time()
dense = Engine(params=qparams, config=config, max_len=64, batch_size=2)
want = dense.generate(prompts, max_new_tokens=n)
print(f"dense oracle ({time.time() - t0:.1f}s): {want}")

for pool_prefill in (False, True):
    t0 = time.time()
    eng = PagedEngine(
        params=qparams, config=config, num_slots=2, block_size=8,
        num_blocks=16, max_len=48, pool_prefill=pool_prefill,
    )
    rids = [eng.submit(p, max_new_tokens=n) for p in prompts]
    out = eng.run()
    got = [out[r] for r in rids]
    assert got == want, (pool_prefill, got, want)
    assert eng.blocks_in_use == 0
    print(f"paged (pool_prefill={pool_prefill}) OK ({time.time() - t0:.1f}s)")

t0 = time.time()
spec = PagedSpeculativeEngine(
    params=qparams, config=config,
    draft_params=qparams, draft_config=config,
    k=3, num_slots=2, block_size=8, num_blocks=20, max_len=64,
)
rids = [spec.submit(p, max_new_tokens=n) for p in prompts]
out = spec.run()
got = [out[r] for r in rids]
assert got == want, (got, want)
assert spec.blocks_in_use == 0
print(f"paged-speculative (fused verify kernel) OK ({time.time() - t0:.1f}s)")
print("PAGED SMOKE PASSED")
