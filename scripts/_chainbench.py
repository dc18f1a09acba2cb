"""Sound on-chip microbenchmark harness for weight-streaming ops.

Two ways a naive TPU matmul microbenchmark lies (both measured round 4,
scripts/probe_scan_overhead.py):

1. Per-dispatch timing through the axon tunnel costs ~1.4 ms of link
   latency per call — every shape "takes" 1.4 ms. Fix: chain the op inside
   ONE jitted `lax.scan` so a single dispatch covers many executions.
2. A scan whose carry consumes only a SLICE of the output lets XLA
   slice-sink into the dot (streaming one weight column, 0.5 us "matmuls"),
   and a single loop-invariant weight can be parked in VMEM across
   iterations — neither happens in a real model step where every layer's
   weights stream from HBM once. Fix: the carry depends on a FULL reduction
   of y, and each iteration walks R distinct weight replicas sized so the
   working set far exceeds VMEM. (Pallas custom calls are opaque to XLA —
   no slice-sinking — but the replica rule still defeats any operand
   caching and keeps dense-vs-pallas comparisons fair.)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

# Comfortably beyond any TPU generation's VMEM.
MIN_WORKING_SET = 300 * 1024 * 1024


def replicate_weights(make_one, nbytes_each: int, max_replicas: int = 32):
    """`make_one(i) -> pytree of weight arrays` for replica i; returns a list
    sized so the total streamed working set exceeds MIN_WORKING_SET."""
    r = max(2, min(max_replicas, -(-MIN_WORKING_SET // max(1, nbytes_each))))
    return [make_one(i) for i in range(r)]


def timeit_chain(step, x0, weights: list, iters: int = 8, reps: int = 3):
    """Median-of-best time per single `step(x, w)` execution.

    Runs `iters` scan iterations x len(weights) serialized steps per
    dispatch; iteration i+1's input depends on a full reduction of
    iteration i's output, so nothing can be sliced away or hoisted."""
    stacked = None
    n_w = len(weights)

    def dep(x, y):
        # Full-output NONLINEAR reduction: every element of y is consumed
        # and — unlike sum, which XLA's algebraic simplifier commutes into
        # the dot (sum_n(x@w) -> x @ sum_n(w), hoisting the weight column
        # sum out of the loop and deleting the matmul; measured r4,
        # probe_exec_cache.py) — reduce-max cannot be sunk through the
        # contraction. The perturbation is orders below bf16 ulp so x
        # stays numerically stable across iterations.
        r = jnp.max(y.astype(jnp.float32), axis=-1, keepdims=True)
        return x + (r * 1e-24).astype(x.dtype)

    @jax.jit
    def run(x, ws):
        def body(x, _):
            for w in ws:
                y = step(x, w)
                x = dep(x, y)
            return x, ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x

    out = run(x0, weights)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x0, weights)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / (iters * n_w)
