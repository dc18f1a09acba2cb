"""A/B harness for the token-major paged-attention redesign.

Correctness vs the naive oracle (CPU interpret or native), then a 12-layer
scan timing comparison of old (head-major packed) vs new (token-major) kernels
at bench shapes.

Usage:
  JAX_PLATFORMS=cpu python scripts/proto_attn2.py check
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/proto_attn2.py check
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/proto_attn2.py perf
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vllmini_tpu.ops import paged_attention as pa2


def make_case(key, B, H, group, d, page_size, pages_per_seq, num_pages,
              dtype, quantized=False, lens=None):
    ks = jax.random.split(key, 8)
    W = pa2.align_row_width(H, d)
    if jnp.dtype(dtype) == jnp.int8:
        kv_pages = jax.random.randint(
            ks[0], (num_pages, 2, page_size, W), -127, 128, jnp.int32
        ).astype(jnp.int8)
    else:
        kv_pages = jax.random.normal(
            ks[0], (num_pages, 2, page_size, W), dtype)
    if W > H * d:  # zero the pad lanes as the write path would
        kv_pages = kv_pages.at[..., H * d:].set(0)
    q_dtype = dtype if jnp.dtype(dtype) != jnp.int8 else jnp.float32
    q = jax.random.normal(ks[2], (B, H * group, d), q_dtype)
    if lens is None:
        lens = jax.random.randint(ks[3], (B,), 1,
                                  pages_per_seq * page_size + 1)
    seq_lens = jnp.asarray(lens, jnp.int32)
    perm = jax.random.permutation(ks[4], num_pages - 1)[
        :B * pages_per_seq].reshape(B, pages_per_seq)
    kv_scales = None
    if quantized:
        kv_scales = jax.random.uniform(
            ks[5], (num_pages, 2, page_size, H), jnp.float32, 0.01, 0.03)
    return dict(q=q, kv_pages=kv_pages, seq_lens=seq_lens,
                page_tables=perm, kv_scales=kv_scales, H=H, d=d)


def check(interpret):
    key = jax.random.PRNGKey(0)
    dtype = jnp.float32 if interpret else jnp.bfloat16
    configs = [
        dict(B=8, H=12, group=1, d=64, page_size=16, pages_per_seq=8,
             num_pages=256, name="gpt2-mha"),
        dict(B=8, H=8, group=4, d=128, page_size=16, pages_per_seq=8,
             num_pages=256, name="llama-gqa"),
        dict(B=8, H=25, group=1, d=64, page_size=16, pages_per_seq=8,
             num_pages=256, name="xl-padded-W"),
    ]
    for cfg in configs:
        name = cfg.pop("name")
        for quant in (False, True):
            c = make_case(key, dtype=jnp.int8 if quant else dtype,
                          quantized=quant, **cfg)
            if quant:
                c["q"] = c["q"].astype(dtype)
            H, d = c.pop("H"), c.pop("d")
            want = pa2.paged_attention_reference(
                c["q"], c["kv_pages"], c["seq_lens"],
                c["page_tables"], num_kv_heads=H,
                kv_scales=c["kv_scales"])
            got = pa2.paged_attention(
                c["q"], c["kv_pages"], c["seq_lens"],
                c["page_tables"], num_kv_heads=H,
                kv_scales=c["kv_scales"], interpret=interpret)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) + 1e-6
            print(f"{name:14s} quant={int(quant)} plain   "
                  f"maxerr={err:.2e} rel={err/scale:.2e}")
            assert err / scale < (2e-2 if dtype == jnp.bfloat16 else 2e-5), \
                (name, quant)

            # partitioned (v2 analog)
            got_p = pa2.paged_attention(
                c["q"], c["kv_pages"], c["seq_lens"],
                c["page_tables"], num_kv_heads=H, kv_partitions=4,
                kv_scales=c["kv_scales"], interpret=interpret)
            err_p = float(jnp.max(jnp.abs(
                got_p.astype(jnp.float32) - want.astype(jnp.float32))))
            print(f"{name:14s} quant={int(quant)} parts=4 "
                  f"maxerr={err_p:.2e} rel={err_p/scale:.2e}")
            assert err_p / scale < (2e-2 if dtype == jnp.bfloat16 else 2e-5)

            # fused write: pool initially missing the last token; kernel
            # writes it and the self term is merged outside.
            pos = c["seq_lens"] - 1
            ps_ = c["kv_pages"].shape[2]
            page_of = jnp.take_along_axis(
                c["page_tables"], (pos // ps_)[:, None], 1)[:, 0]
            row_of = pos % ps_
            kf = jax.random.normal(jax.random.PRNGKey(12),
                                   (c["q"].shape[0], H, d), jnp.float32)
            vf = jax.random.normal(jax.random.PRNGKey(13),
                                   (c["q"].shape[0], H, d), jnp.float32)
            if quant:
                kq = jnp.clip(jnp.round(kf / 0.02), -127, 127)
                vq = jnp.clip(jnp.round(vf / 0.02), -127, 127)
                k_new, v_new = kq.astype(jnp.int8), vq.astype(jnp.int8)
                k_raw, v_raw = kq * 0.02, vq * 0.02
                sc2 = c["kv_scales"].at[page_of, :, row_of].set(0.02)
            else:
                k_new, v_new = kf.astype(dtype), vf.astype(dtype)
                k_raw = v_raw = None
                sc2 = None
            got_f, kv2 = pa2.paged_attention(
                c["q"], c["kv_pages"], c["seq_lens"],
                c["page_tables"], num_kv_heads=H, kv_scales=sc2,
                k_new=k_new, v_new=v_new, k_new_raw=k_raw, v_new_raw=v_raw,
                interpret=interpret)
            # oracle on the POST-write pool
            want_f = pa2.paged_attention_reference(
                c["q"], kv2, c["seq_lens"], c["page_tables"],
                num_kv_heads=H, kv_scales=sc2)
            err_f = float(jnp.max(jnp.abs(
                got_f.astype(jnp.float32) - want_f.astype(jnp.float32))))
            # and the write itself landed
            row = kv2[page_of, 0, row_of][:, :H * d].reshape(
                c["q"].shape[0], H, d)
            werr = float(jnp.max(jnp.abs(
                row.astype(jnp.float32) - k_new.astype(jnp.float32))))
            print(f"{name:14s} quant={int(quant)} fused   "
                  f"maxerr={err_f:.2e} rel={err_f/scale:.2e} write={werr:.1e}")
            assert err_f / scale < (2e-2 if dtype == jnp.bfloat16 else 2e-5)
            assert werr == 0.0

    # sliding window
    c = make_case(key, B=8, H=8, group=1, d=128, page_size=16,
                  pages_per_seq=8, num_pages=256, dtype=dtype)
    H, d = c.pop("H"), c.pop("d")
    want = pa2.paged_attention_reference(
        c["q"], c["kv_pages"], c["seq_lens"], c["page_tables"],
        num_kv_heads=H, sliding_window=40)
    got = pa2.paged_attention(
        c["q"], c["kv_pages"], c["seq_lens"], c["page_tables"],
        num_kv_heads=H, sliding_window=40, interpret=interpret)
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - want.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) + 1e-6
    print(f"{'window':14s} rel={err/scale:.2e}")
    assert err / scale < (2e-2 if dtype == jnp.bfloat16 else 2e-5)
    print("ALL CHECKS PASS")


def perf():
    assert jax.default_backend() == "tpu"
    STEPS, N, L = 16, 6, 12
    B, H, d, group = 32, 12, 64, 1
    page_size, pages_per_seq = 32, 32
    ctx = 200
    num_pages = B * pages_per_seq + 64
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    W = pa2.align_row_width(H, d)
    kv_pages = jax.random.normal(key, (num_pages, 2, page_size, W), dtype)
    q = jax.random.normal(key, (B, H * group, d), dtype)
    kn = jax.random.normal(key, (B, H, d), dtype)
    seq_lens = jnp.full((B,), ctx, jnp.int32)
    pt = (jnp.arange(B * pages_per_seq, dtype=jnp.int32)
          .reshape(B, pages_per_seq) % num_pages)

    def chunk_new(kv, q):
        def body(carry, _):
            kv, q = carry
            for _ in range(L):
                o, kv = pa2.paged_attention(
                    q, kv, seq_lens, pt, num_kv_heads=H,
                    k_new=kn, v_new=kn)
            return (kv, o[:, :H]), None
        carry, _ = jax.lax.scan(body, (kv, q), None, length=STEPS)
        return carry
    f_new = jax.jit(chunk_new, donate_argnums=(0,))

    def timeit(name, fn, *args):
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(N):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / N / STEPS
        print(f"{name:34s} {dt*1e3:8.3f} ms/step")
        return dt

    timeit("interleaved fused x12", lambda: f_new(jnp.copy(kv_pages), q))
    # (r1 head-major baseline here: 1.53 ms; token-major split-KV: 1.04 ms)

    # long-context single-seq: partitioned vs plain
    B2, ctx2, pps2 = 2, 8192, 256
    np2 = B2 * pps2 + 8
    kv2 = jax.random.normal(key, (np2, 2, page_size, W), dtype)
    q2 = jax.random.normal(key, (B2, H * group, d), dtype)
    sl2 = jnp.full((B2,), ctx2, jnp.int32)
    pt2 = (jnp.arange(B2 * pps2, dtype=jnp.int32).reshape(B2, pps2) % np2)

    for parts in (1, 8):
        def chunk_p(q, parts=parts):
            def body(q, _):
                for _ in range(L):
                    o = pa2.paged_attention(
                        q, kv2, sl2, pt2, num_kv_heads=H,
                        kv_partitions=parts)
                return q + o[:, :H * group] * 0, None
            out, _ = jax.lax.scan(body, q, None, length=STEPS)
            return out
        f_p = jax.jit(chunk_p)
        timeit(f"long-ctx b2 ctx8k parts={parts} x12", lambda f=f_p: f(q2))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check(interpret=jax.default_backend() != "tpu")
    else:
        perf()
