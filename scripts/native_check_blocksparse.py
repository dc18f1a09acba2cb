"""Native (real-TPU) check of the block-sparse decode path.

Interpret-mode CPU tests miss Mosaic legalization failures; the specific
risk here is `jax.lax.rem` on an int32 VECTOR ([M, bT]) — integer vector
mod has no guaranteed lowering on all Mosaic versions. Run this the moment
the tunnel is back (scripts/tpu_queue.sh does).
"""

import jax
import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, "/root/repo")

from vllmini_tpu.ops.paged_attention import (BlockSparse,  # noqa: E402
                                             paged_attention,
                                             paged_attention_reference)


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(3)
    B, Hq, Hkv, d, ps, pps = 4, 8, 8, 128, 16, 8
    npages = B * pps + 1
    q = jax.random.normal(key, (B, Hq, d), jnp.bfloat16)
    kv = jax.random.normal(jax.random.fold_in(key, 1),
                           (npages, 2, ps, Hkv * d), jnp.bfloat16)
    sl = jnp.asarray([100, 17, 64, 128], jnp.int32)
    pt = jnp.arange(B * pps, dtype=jnp.int32).reshape(B, pps)
    bs = BlockSparse(2, 4, 16, 1)
    out = paged_attention(q, kv, sl, pt, num_kv_heads=Hkv, blocksparse=bs)
    ref = paged_attention_reference(q.astype(jnp.float32),
                                    kv.astype(jnp.float32), sl, pt,
                                    num_kv_heads=Hkv, blocksparse=bs)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    print("max |err| vs oracle:", err)
    assert err < 3e-2, err
    print("NATIVE BLOCKSPARSE OK")


if __name__ == "__main__":
    main()
