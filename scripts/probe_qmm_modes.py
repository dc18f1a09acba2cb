"""On-chip probe: which int4 unpack modes compile, and at what shapes the
quantized matmul fits VMEM. Run on the real chip; prints one line per case.

VERDICT r3 findings to reproduce/verify:
  (1) unpack="bf16" fails to compile on v5e (no bf16 ALU);
  (2) M=512 (burst prefill) VMEM-OOMs with the default bn=2048/bk=1024 tiles.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllmini_tpu.ops.quant_matmul import _qmm_2d, quantize_weight

print("devices:", jax.devices(), flush=True)

K, N, G = 4096, 6144, 128
rng = np.random.default_rng(0)
w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.02)
qw = quantize_weight(w, bits=4, group_size=G)
qv, sc = jax.device_put(qw.qvalues), jax.device_put(qw.scales)

for M in (8, 64, 512):
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32) * 0.1,
                    dtype=jnp.bfloat16)
    for mode in ("bf16", "i32", "f32", "i8"):
        try:
            y = _qmm_2d(x, qv, sc, bits=4, group_size=G, unpack=mode)
            y.block_until_ready()
            # correctness vs dequant reference
            from vllmini_tpu.ops.quant_matmul import dequantize_weight
            ref = (x.astype(jnp.float32) @ dequantize_weight(qw))
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref))
                        / (float(jnp.max(jnp.abs(ref))) + 1e-9))
            print(f"M={M:4d} unpack={mode:5s} OK   relerr={err:.2e}",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"M={M:4d} unpack={mode:5s} FAIL {type(e).__name__}: {msg}",
                  flush=True)
