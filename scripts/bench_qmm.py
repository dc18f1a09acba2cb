"""On-chip A/B microbenchmark for the int4 dequant-matmul (VERDICT r3 #1a).

Round-2 trace: int4 qmm = 9.0 ms of the 16 ms 8B step at 1.5x its
weight-stream time; the suspect is the i32-widening nibble unpack (sublane-
expanding relayout). Candidates measured here on the real llama-8B decode
shapes (fused projections, M = batch = 32):

  i32    — integer-domain unpack (round-2 shipping kernel)
  bf16   — float-domain unpack: i8->bf16 convert + floor/fma split, two
           half-group MXU dots (no widen, no concat)  [shipping default]
  int4   — native jnp.int4 storage; Mosaic's own unpack on load (EXPERIMENT)

Prints per-shape us + achieved GB/s vs the 819 GB/s stream bound.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_qmm.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")

from vllmini_tpu.ops.quant_matmul import (  # noqa: E402
    _largest_divisor_tile, _qmm_2d, dequantize_weight, quantize_weight)

HBM_GBS = 819.0
M = 32
G = 128
# llama-3-8B decode shapes after projection fusion (models/fuse.py):
# fused QKV, attn out, fused gate|up, down.
SHAPES = [("qkv", 4096, 6144), ("o", 4096, 4096),
          ("gate|up", 4096, 28672), ("down", 14336, 4096)]


def _native_int4_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *,
                        group_size: int, k_tiles: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    G = group_size
    groups = q_ref.shape[0] // G
    acc = acc_ref[...]
    for g in range(groups):
        w = q_ref[pl.ds(g * G, G), :].astype(x.dtype)  # Mosaic s4 unpack
        prod = jax.lax.dot(x[:, g * G:(g + 1) * G], w,
                           preferred_element_type=jnp.float32)
        acc += prod * s_ref[pl.ds(k * groups + g, 1), :]
    acc_ref[...] = acc

    @pl.when(k == k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size",))
def _native_int4_qmm(x, q4, scales, *, group_size: int):
    Mx, K = x.shape
    N = q4.shape[1]
    bn = _largest_divisor_tile(N, min(2048, N))
    bk = min(max(1024, group_size), K)
    while K % bk != 0 or bk % group_size != 0:
        bk -= group_size
    k_tiles = K // bk
    return pl.pallas_call(
        functools.partial(_native_int4_kernel, group_size=group_size,
                          k_tiles=k_tiles),
        grid=(N // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((Mx, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((K // group_size, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Mx, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Mx, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((Mx, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, q4, scales)


def unpack_to_int8(qw):
    """Packed split-half int8 [K/2, N] -> plain int8 rows [K, N]."""
    Kp, N = qw.qvalues.shape
    K = Kp * 2
    Gq = qw.group_size
    packed = np.asarray(qw.qvalues).reshape(K // Gq, Gq // 2, N)
    low = ((packed.astype(np.int32) & 15) ^ 8) - 8
    high = (((packed.astype(np.int32) >> 4) & 15) ^ 8) - 8
    return np.concatenate([low, high], axis=1).reshape(K, N).astype(np.int8)


def timeit(fn, *args, iters=30):
    y = fn(*args)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, y


def timeit_chain(step, x0, iters=64):
    """Time `iters` SERIALIZED calls of `step` inside ONE jitted scan.

    Through the axon tunnel each device dispatch costs ~1.4 ms of link
    latency — individually dispatched micro-timings measure only the link
    (measured r4: every int4 shape "took" 1.39-1.44 ms flat). Chaining the
    op in a scan amortizes one dispatch over `iters` kernel executions,
    exactly like the engine's chunked decode. The carry perturbation makes
    iteration i+1 data-depend on i so XLA cannot hoist the matmul out of
    the loop; 1e-24 * y is below bf16 ulp so x stays numerically fixed."""
    @jax.jit
    def run(x):
        def body(x, _):
            y = step(x)
            return x + y[:, :1].astype(x.dtype) * 1e-24, ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x
    out = run(x0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  M={M}")
    total = {"i32": 0.0, "f32": 0.0, "int4": 0.0, "bound": 0.0}
    for name, K, N in SHAPES:
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        qw = quantize_weight(w, 4, G)
        ref = np.asarray(
            (x.astype(jnp.float32) @ dequantize_weight(qw)))
        bytes_streamed = K * N // 2 + (K // G) * N * 4
        bound_us = bytes_streamed / (HBM_GBS * 1e3)
        total["bound"] += bound_us
        print(f"-- {name}: [{K}x{N}] int4  stream-bound {bound_us:7.1f} us")
        # "bf16" is omitted: it does not compile on v5e (no bf16 VPU
        # floor/fma — probe_qmm_modes.py). "f32" is the concat-free
        # float-domain unpack at f32 width.
        for up in ("i32", "f32"):
            f = lambda xx, up=up: _qmm_2d(xx, qw.qvalues, qw.scales, bits=4,
                                          group_size=G, unpack=up)
            y = f(x)
            err = float(np.max(np.abs(np.asarray(y, np.float32) - ref))
                        / np.max(np.abs(ref)))
            dt = timeit_chain(f, x)
            total[up] += dt * 1e6
            print(f"   {up:5s} {dt*1e6:7.1f} us  {bytes_streamed/dt/1e9:6.1f}"
                  f" GB/s  ({dt*1e6/bound_us:4.2f}x bound)  relerr {err:.1e}",
                  flush=True)
        try:
            q4 = jnp.asarray(unpack_to_int8(qw), dtype=jnp.int4)
            f4 = lambda xx: _native_int4_qmm(xx, q4, qw.scales, group_size=G)
            y = f4(x)
            err = float(np.max(np.abs(np.asarray(y, np.float32) - ref))
                        / np.max(np.abs(ref)))
            dt = timeit_chain(f4, x)
            total["int4"] += dt * 1e6
            print(f"   int4  {dt*1e6:7.1f} us  {bytes_streamed/dt/1e9:6.1f}"
                  f" GB/s  ({dt*1e6/bound_us:4.2f}x bound)  relerr {err:.1e}",
                  flush=True)
        except Exception as e:  # Mosaic may reject s4 refs on this version
            print(f"   int4  UNSUPPORTED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
    n_layers = 32
    print("\nper-layer x32 totals (us):",
          {k: round(v * n_layers, 0) for k, v in total.items()})


if __name__ == "__main__":
    main()
