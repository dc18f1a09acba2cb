"""Microbenchmarks for the decode-attention redesign hypotheses (on TPU).

A: scores math — batched tiny dots [SH,1,128]x[SH,bR,128] (current) vs one
   block-diagonal matmul [Hq, H*128] x [H*128, bR] (proposed).
B: page DMA — strided head-major page copies vs contiguous token-major pages.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/proto_attn.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, H, d, bR, lane = 8, 12, 64, 64, 128  # packed P=2: bR rows of 128 lanes
SH = S * H
REPS = 100  # loop inside kernel to dominate launch cost


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n / REPS
    print(f"{name:44s} {dt*1e6:9.2f} us/rep")
    return dt


# ---- A1: current batched tiny dots ------------------------------------
def k_batched(q_ref, k_ref, o_ref):
    def body(i, acc):
        s = jax.lax.dot_general(
            q_ref[...], k_ref[...],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [SH, 1, bR]
        return acc + jnp.sum(s)
    o_ref[0, 0] = jax.lax.fori_loop(0, REPS, body, 0.0)


def run_batched(q, k):
    return pl.pallas_call(
        k_batched,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(q, k)


# ---- A2: block-diagonal single matmul per member ----------------------
def k_blockdiag(q_ref, k_ref, o_ref):
    # q_ref: [S, Hq, H*lane] block-diagonal; k_ref: [S, bR, H*lane]
    def body(i, acc):
        t = 0.0
        for s in range(S):
            sc = jax.lax.dot_general(
                q_ref[s], k_ref[s],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [Hq, bR]
            t += jnp.sum(sc)
        return acc + t
    o_ref[0, 0] = jax.lax.fori_loop(0, REPS, body, 0.0)


def run_blockdiag(qbd, kc):
    return pl.pallas_call(
        k_blockdiag,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(qbd, kc)


# ---- B: DMA patterns ----------------------------------------------------
PAGES, ROWS = 256, 16
NCOPY = 64  # pages copied per rep


def k_dma(idx_ref, pages_ref, o_ref, buf, sem, *, strided: bool):
    def body(i, acc):
        copies = []
        for j in range(NCOPY):
            pg = idx_ref[j]
            if strided:
                copies.append(pltpu.make_async_copy(
                    pages_ref.at[:, pg], buf.at[j], sem))
            else:
                copies.append(pltpu.make_async_copy(
                    pages_ref.at[pg], buf.at[j], sem))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        return acc + 1
    o_ref[0, 0] = jax.lax.fori_loop(0, REPS // 10, body, 0)


def run_dma(idx, pages, strided):
    bufshape = ((NCOPY, H, ROWS, lane) if strided
                else (NCOPY, ROWS, H * lane))
    return pl.pallas_call(
        functools.partial(k_dma, strided=strided),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM(bufshape, jnp.bfloat16),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, pages)


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (SH, 1, lane), jnp.float32)
    k = jax.random.normal(key, (SH, bR, lane), jnp.float32)
    d_a1 = timeit("A1 batched tiny dots (current)", jax.jit(run_batched), q, k)

    qbd = jax.random.normal(key, (S, H, H * lane), jnp.float32)
    kc = jax.random.normal(key, (S, bR, H * lane), jnp.float32)
    d_a2 = timeit("A2 block-diagonal matmul", jax.jit(run_blockdiag), qbd, kc)
    print(f"  -> speedup {d_a1/d_a2:.2f}x")

    idx = jnp.asarray(np.random.default_rng(0).permutation(PAGES)[:NCOPY],
                      jnp.int32)
    pages_hm = jnp.zeros((H, PAGES, ROWS, lane), jnp.bfloat16)
    d_b1 = timeit("B1 strided head-major page DMA x64",
                  jax.jit(functools.partial(run_dma, strided=True)),
                  idx, pages_hm, n=10)
    pages_tm = jnp.zeros((PAGES, ROWS, H * lane), jnp.bfloat16)
    d_b2 = timeit("B2 contiguous token-major page DMA x64",
                  jax.jit(functools.partial(run_dma, strided=False)),
                  idx, pages_tm, n=10)
    print(f"  -> speedup {d_b1/d_b2:.2f}x")


if __name__ == "__main__":
    main()
