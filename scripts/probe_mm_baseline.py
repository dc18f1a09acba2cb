"""Calibration probe: dense bf16 matmul vs quantized kernels in the sound
chained harness (scripts/_chainbench.py). Establishes the real on-chip cost
of each matmul flavor at llama-8B decode shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mm_baseline.py
  PM=<M>  batch rows (default 32)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _chainbench import replicate_weights, timeit_chain
from vllmini_tpu.ops.quant_matmul import (_qmm_2d, _w8a8_2d,
                                          quantize_activations,
                                          quantize_weight)

HBM_GBS = 819.0
M = int(os.environ.get("PM", "32"))
G = 128
K, N = 4096, 6144


def report(name, dt, nbytes):
    bound = nbytes / (HBM_GBS * 1e9)
    print(f"{name:28s} {dt*1e6:8.1f} us  {nbytes/dt/1e9:7.1f} GB/s  "
          f"({dt/bound:5.2f}x stream bound)", flush=True)


def main():
    print(f"backend={jax.default_backend()} M={M} K={K} N={N}", flush=True)
    rng = np.random.default_rng(0)
    w_np = rng.normal(size=(K, N)).astype(np.float32) * 0.02
    w = jnp.asarray(w_np)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    wbf = w.astype(jnp.bfloat16)
    dense = replicate_weights(lambda i: wbf + jnp.bfloat16(0), K * N * 2)
    dt = timeit_chain(
        lambda xx, ww: jnp.dot(xx, ww, preferred_element_type=jnp.float32)
        .astype(jnp.bfloat16), x, dense)
    report(f"dense bf16 (XLA dot) x{len(dense)}", dt, K * N * 2)
    del dense

    qw8 = quantize_weight(w, 8, G)
    nb8 = K * N + (K // G) * N * 4
    reps8 = replicate_weights(
        lambda i: (qw8.qvalues + jnp.int8(0), qw8.scales + 0), nb8)
    dt = timeit_chain(
        lambda xx, ww: _qmm_2d(xx, ww[0], ww[1], bits=8, group_size=G),
        x, reps8)
    report(f"qmm int8 x{len(reps8)}", dt, nb8)

    def w8a8_step(xx, ww):
        xq, xs = quantize_activations(xx)
        return _w8a8_2d(xq, xs, ww[0], ww[1], group_size=G,
                        out_dtype=jnp.bfloat16)
    dt = timeit_chain(w8a8_step, x, reps8)
    report(f"w8a8 int8xint8 x{len(reps8)}", dt, nb8)

    # XLA-native dequant + dot (no pallas): does XLA fuse the int8->bf16
    # convert * scale into the dot's weight load, or materialize?
    s_rows = jnp.repeat(qw8.scales, G, axis=0).astype(jnp.bfloat16)

    def xla_deq(xx, ww):
        wd = ww[0].astype(jnp.bfloat16) * s_rows
        return jnp.dot(xx, wd, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)
    dt = timeit_chain(xla_deq, x, reps8)
    report(f"XLA int8 dequant+dot x{len(reps8)}", dt, nb8)
    del reps8

    qw4 = quantize_weight(w, 4, G)
    nb4 = K * N // 2 + (K // G) * N * 4
    reps4 = replicate_weights(
        lambda i: (qw4.qvalues + jnp.int8(0), qw4.scales + 0), nb4)
    for up in ("i32", "i8", "f32"):
        try:
            dt = timeit_chain(
                lambda xx, ww, up=up: _qmm_2d(xx, ww[0], ww[1], bits=4,
                                              group_size=G, unpack=up),
                x, reps4)
            report(f"qmm int4 {up} x{len(reps4)}", dt, nb4)
        except Exception as e:
            print(f"qmm int4 {up}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    # Native s4 storage: Mosaic's own packed-int4 load + convert.
    try:
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _s4_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *,
                       group_size, k_tiles):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            Gq = group_size
            groups = q_ref.shape[0] // Gq
            acc = acc_ref[...]
            xx = x_ref[...]
            for g in range(groups):
                wt = q_ref[pl.ds(g * Gq, Gq), :].astype(xx.dtype)
                prod = jax.lax.dot(xx[:, g * Gq:(g + 1) * Gq], wt,
                                   preferred_element_type=jnp.float32)
                acc += prod * s_ref[pl.ds(k * groups + g, 1), :]
            acc_ref[...] = acc

            @pl.when(k == k_tiles - 1)
            def _():
                o_ref[...] = acc_ref[...].astype(o_ref.dtype)

        def s4_qmm(xx, q4, scales):
            Mx, Kx = xx.shape
            Nx = q4.shape[1]
            bn, bk = 2048, 1024
            return pl.pallas_call(
                functools.partial(_s4_kernel, group_size=G,
                                  k_tiles=Kx // bk),
                grid=(Nx // bn, Kx // bk),
                in_specs=[
                    pl.BlockSpec((Mx, bk), lambda n, k: (0, k)),
                    pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
                    pl.BlockSpec((Kx // G, bn), lambda n, k: (0, n)),
                ],
                out_specs=pl.BlockSpec((Mx, bn), lambda n, k: (0, n)),
                out_shape=jax.ShapeDtypeStruct((Mx, Nx), xx.dtype),
                scratch_shapes=[pltpu.VMEM((Mx, bn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(xx, q4, scales)

        # Unpack the split-half layout to plain int8 rows, store as s4.
        import sys as _sys
        _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_qmm import unpack_to_int8
        q4_rows = unpack_to_int8(qw4)
        reps_s4 = replicate_weights(
            lambda i: (jnp.asarray(q4_rows, dtype=jnp.int4),
                       qw4.scales + 0), nb4)
        dt = timeit_chain(lambda xx, ww: s4_qmm(xx, ww[0], ww[1]),
                          x, reps_s4)
        report(f"qmm native s4 x{len(reps_s4)}", dt, nb4)
    except Exception as e:
        print(f"qmm native s4: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
