"""End-to-end drive on the real TPU: quantize -> model -> generate, plus
per-bit-width layer checks, HIGGS pair mode, Hadamard, and a kernel
bench_op roofline number. Used by /verify."""

import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())

import flute_tpu
from flute_tpu.models import llama
from flute_tpu.ops import lut_gemm
from flute_tpu.ops.hadamard import hadamard_transform
from flute_tpu.quantize import higgs, nf
from flute_tpu.serving import greedy_generate
from flute_tpu.utils.benchmark import bench_op

rng = np.random.default_rng(0)

# --- 1. QuantizedLinear per bit width: identity + random oracle ---
for bits in (2, 3, 4):
    w = jnp.asarray(rng.standard_normal((512, 1024)), jnp.float32)
    layer = flute_tpu.quantize_linear(w, num_bits=bits, group_size=64)
    deq = layer.dequantize(jnp.bfloat16)
    # 4-bit quantize_linear defaults to the w4sym layout, which shares the
    # classic plane shape and so must be named explicitly (packing.py:326)
    recon = flute_tpu.reconstruct(
        list(layer.planes), layer.scales, layer.table, bits, layout=layer.layout
    )
    assert np.array_equal(np.asarray(deq, np.float32), np.asarray(recon, np.float32)), bits
    x = jnp.asarray(rng.standard_normal((5, 1024)), jnp.bfloat16)
    y = np.asarray(layer(x), np.float32)
    want = np.asarray(
        jnp.dot(x, deq, preferred_element_type=jnp.float32), np.float32
    )
    rel = np.abs(y - want).max() / max(np.abs(want).max(), 1e-6)
    assert rel < 1.1e-2, (bits, rel)
    print(f"W{bits}: identity bit-exact, random rel={rel:.2e}  OK")

# --- 2. HIGGS pair mode on TPU ---
e = 16
codes = rng.integers(0, e * e, (512, 256), dtype=np.int64)
grid = rng.standard_normal((e * e, 2)).astype(np.float32)
scales = jnp.asarray(rng.uniform(0.5, 1.5, (16, 256)), jnp.bfloat16)
hl = higgs.from_higgs(codes, grid, scales, num_bits=4, group_size=64)
deq = np.asarray(hl.dequantize(jnp.bfloat16), np.float32)
assert np.isfinite(deq).all()
print("HIGGS pair_lut dequant OK", deq.shape)

# --- 3. Hadamard on TPU ---
x = jnp.asarray(rng.standard_normal((4, 4096)), jnp.bfloat16)
y = hadamard_transform(hadamard_transform(x))
err = np.abs(np.asarray(y, np.float32) - np.asarray(x, np.float32)).max()
assert err < 0.15, err  # bf16 double-rotation
print(f"Hadamard involution max err {err:.3f} OK")

# --- 4. Tiny quantized llama greedy generation ---
config = llama.LlamaConfig.tiny()
params = llama.init_params(config, rng=0)
qparams = llama.quantize_model(params, num_bits=4, group_size=64)
t0 = time.time()
out = greedy_generate(qparams, config, [[1, 5, 9], [2, 6, 10, 14]], max_new_tokens=8, max_len=32)
print(f"generation OK ({time.time() - t0:.1f}s):", out)
fout = greedy_generate(params, config, [[1, 5, 9], [2, 6, 10, 14]], max_new_tokens=8, max_len=32)
print("dense generation:", fout)

# --- 5. bench_op roofline check (M16 N28672 K8192 W4G64) ---
m, n, k, bits, g = 16, 28672, 8192, 4, 64
codes = rng.integers(0, 2**bits, size=(k, n), dtype=np.int32)
planes = [jax.device_put(p) for p in flute_tpu.pack(jnp.asarray(codes), bits)]
scales = jnp.asarray(rng.uniform(0.5, 1.5, (k // g, n)), jnp.bfloat16)
table = nf.nf_values(bits)
x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)

def f(x_):
    return lut_gemm.lut_qgemm(x_, planes, scales, table, num_bits=bits, interpret=False)

t = bench_op(f, x, iters=50)
byts = sum(p.size * 4 for p in planes) + scales.size * 2 + x.size * 2 + m * n * 2
gbps = byts / t / 1e9
print(f"bench: {t * 1e6:.1f} us, {gbps:.1f} GB/s ({100 * gbps / 819:.1f}% roofline)")
print("ALL E2E CHECKS PASSED")
