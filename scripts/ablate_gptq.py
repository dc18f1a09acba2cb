"""Ablate the three int4-GPTQ levers (act_order / weighted_clip / refine)
on the trained gate model: for each of the 8 combinations report

  * the layer-wise GPTQ objective  Σ_w tr(δWᵀ H δW)   (the proxy GPTQ
    minimizes), and
  * the TRUE gate metric, ΔPPL on the held-out eval stream,

so lever choices are made on ground truth and the proxy's alignment is
itself measured. Uses GATE_MODEL_PATH (or data/gate_model.npz).

Usage: python scripts/ablate_gptq.py  [--fast: objective only]
"""

from __future__ import annotations

import itertools
import os
import sys

import jax

# Force CPU unless explicitly asked for the device: querying
# jax.default_backend() would INITIALIZE the axon backend, which hangs
# forever when the tunnel relay is down.
if os.environ.get("ABLATE_ON_DEVICE") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")

from train_gate_model import load_params, make_batches  # noqa: E402

from vllmini_tpu.config import QuantConfig  # noqa: E402
from vllmini_tpu.evaluation.ppl import perplexity  # noqa: E402
from vllmini_tpu.models.common import QuantizedWeight  # noqa: E402
from vllmini_tpu.ops.quant_equalize import equalize_params  # noqa: E402
from vllmini_tpu.ops.quant_gptq import (collect_hessians,  # noqa: E402
                                        gptq_quantize_params)
from vllmini_tpu.ops.quant_matmul import dequantize_weight  # noqa: E402


def flat_weights(params):
    out = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}", v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(f"{prefix}.{i}", v)
        else:
            out[prefix] = node

    walk("", params)
    return out


def objective(eq, qp, hessians):
    """Σ_w tr(δWᵀ H δW) over weights that have a Hessian."""
    orig = flat_weights(eq)
    quant = flat_weights(qp)
    total = 0.0
    for name, w in orig.items():
        q = quant.get(name)
        if not isinstance(q, QuantizedWeight):
            continue
        h = hessians.get(id(w))
        if h is None:
            continue
        dw = np.asarray(dequantize_weight(q), np.float64) - np.asarray(
            w, np.float64)
        total += float(np.sum(dw * (h @ dw)))
    return total


def main():
    fast = "--fast" in sys.argv
    path = os.environ.get("GATE_MODEL_PATH") or "data/gate_model.npz"
    params, config, stream = load_params(path)
    W = 256
    base = perplexity(params, config, stream, window=W)
    print(f"model {path}  base ppl {base:.4f}")

    eq = equalize_params(params, config)
    calib = make_batches(3, 4096)
    hs = collect_hessians(eq, config, calib, window=W, max_windows=16)
    print(f"hessians: {len(hs)} weights")

    rows = []
    for ao, wc, rf in itertools.product((False, True), repeat=3):
        qp = gptq_quantize_params(eq, QuantConfig(weight_dtype="int4"), hs,
                                  act_order=ao, weighted_clip=wc, refine=rf)
        obj = objective(eq, qp, hs)
        dppl = (perplexity(qp, config, stream, window=W) - base
                if not fast else float("nan"))
        rows.append((ao, wc, rf, obj, dppl))
        print(f"act_order={int(ao)} weighted_clip={int(wc)} refine={int(rf)}"
              f"  obj={obj:10.4f}  dppl={dppl:+8.4f}", flush=True)

    rows.sort(key=lambda r: r[3])
    print("\nranked by objective:")
    for ao, wc, rf, obj, dppl in rows:
        print(f"  ao={int(ao)} wc={int(wc)} rf={int(rf)}"
              f"  obj={obj:10.4f}  dppl={dppl:+8.4f}")


if __name__ == "__main__":
    main()
