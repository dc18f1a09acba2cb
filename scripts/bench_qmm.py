"""On-chip A/B microbenchmark for the int4 dequant-matmul (VERDICT r3 #1a).

Round-2 trace: int4 qmm = 9.0 ms of the 16 ms 8B step at 1.5x its
weight-stream time; the suspect is the i32-widening nibble unpack (sublane-
expanding relayout). Candidates measured here on the real llama-8B decode
shapes (fused projections, M = batch = 32):

  i8     — byte-dense and/xor nibble split, bf16-multiply high recovery
           [shipping default — fastest measured on v5e]
  i32    — integer-domain unpack (round-2 shipping kernel)
  f32    — float-domain unpack: i8->f32 convert + floor/fma split, two
           half-group MXU dots (no concat)
  int4   — native jnp.int4 storage; Mosaic's own unpack on load (EXPERIMENT)

("bf16" is omitted: it does not compile on v5e — no bf16 VPU floor/fma,
scripts/probe_qmm_modes.py.)

Timing uses scripts/_chainbench.timeit_chain — the sound harness (ADVICE
r4): iteration i+1 depends on a full NONLINEAR reduction of iteration i's
output (no slice-sinking), and each iteration walks distinct weight
replicas whose working set exceeds VMEM (no operand parking) — so numbers
are comparable to a real model step where every layer streams from HBM.

Prints per-shape us + achieved GB/s vs the 819 GB/s stream bound.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_qmm.py
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _chainbench import replicate_weights, timeit_chain  # noqa: E402
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


def unpack_to_int8(qvalues, group_size):
    """Packed split-half int8 [K/2, N] -> plain int8 rows [K, N]."""
    Kp, N = qvalues.shape
    K = Kp * 2
    packed = np.asarray(qvalues).reshape(K // group_size, group_size // 2, N)
    low = ((packed.astype(np.int32) & 15) ^ 8) - 8
    high = (((packed.astype(np.int32) >> 4) & 15) ^ 8) - 8
    return np.concatenate([low, high], axis=1).reshape(K, N).astype(np.int8)


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  M={M}")
    total = {"i8": 0.0, "i32": 0.0, "f32": 0.0, "int4": 0.0, "bound": 0.0}
    for name, K, N in SHAPES:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        bytes_streamed = K * N // 2 + (K // G) * N * 4

        def make_one(i):
            w = jnp.asarray(
                np.random.default_rng(i).normal(size=(K, N)).astype(
                    np.float32) * 0.02)
            qw = quantize_weight(w, 4, G)
            return (jax.device_put(qw.qvalues), jax.device_put(qw.scales))

        replicas = replicate_weights(make_one, bytes_streamed)
        qv0, sc0 = replicas[0]
        from vllmini_tpu.ops.quant_matmul import QuantizedWeight
        qw0 = QuantizedWeight(qvalues=qv0, scales=sc0, bits=4, group_size=G)
        ref = np.asarray(x.astype(jnp.float32) @ dequantize_weight(qw0))
        bound_us = bytes_streamed / (HBM_GBS * 1e3)
        total["bound"] += bound_us
        print(f"-- {name}: [{K}x{N}] int4  stream-bound {bound_us:7.1f} us"
              f"  ({len(replicas)} replicas)", flush=True)
        for up in ("i8", "i32", "f32"):
            step = lambda xx, wv, up=up: _qmm_2d(
                xx, wv[0], wv[1], bits=4, group_size=G, unpack=up)
            y = step(x, replicas[0])
            err = float(np.max(np.abs(np.asarray(y, np.float32) - ref))
                        / np.max(np.abs(ref)))
            dt = timeit_chain(step, x, replicas)
            total[up] += dt * 1e6
            print(f"   {up:5s} {dt*1e6:7.1f} us  {bytes_streamed/dt/1e9:6.1f}"
                  f" GB/s  ({dt*1e6/bound_us:4.2f}x bound)  relerr {err:.1e}",
                  flush=True)
        try:
            reps4 = [(jnp.asarray(unpack_to_int8(qv, G), dtype=jnp.int4), sc)
                     for qv, sc in replicas]
            step4 = lambda xx, wv: _native_int4_qmm(
                xx, wv[0], wv[1], group_size=G)
            y = step4(x, reps4[0])
            err = float(np.max(np.abs(np.asarray(y, np.float32) - ref))
                        / np.max(np.abs(ref)))
            dt = timeit_chain(step4, x, reps4)
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
