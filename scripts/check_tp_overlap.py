"""TPU-compiler-backed collective budget for the REAL engine TP decode step.

VERDICT r3 #9 asked for compile-time overlap evidence for the TP decode
path. Two facts shape what is honestly checkable without multi-chip
hardware (both established by probing this round):

- The CPU backend (tests/test_collective_budget.py) lowers synchronous
  all-reduces only — async pairs never appear, so the existing CPU test
  can pin the COUNT but says nothing about what the TPU compiler does.
- The real v5e compiler, reached via AOT compile against a
  `v5e:2x2` TopologyDescription (no second chip needed), does not expose
  `all-reduce-start/done` pairs in post-optimization HLO text either —
  on this generation overlap is delegated below HLO (tried
  `xla_enable_async_all_reduce` + latency-hiding-scheduler options; the
  option is accepted but pairs never materialize in text).

So the strongest compile-time statement available is made HERE, with the
actual TPU compiler rather than the CPU one: the real `LLMEngine._chunk_fn`
(TP=2 llama + gpt2), AOT-compiled for a v5e topology, ships EXACTLY
2 all-reduces per layer and zero all-gathers/reduce-scatters/all-to-alls
on the decode critical path, and every all-reduce payload is the tiny
[B, hidden] residual (bytes printed) — the precondition for ICI latency
hiding at runtime.

Engine arrays never touch the topology devices: sharding placement helpers
are stubbed to identity and the step is lowered with ShapeDtypeStructs
(abstract AOT), so only the compiler runs.

Usage (TPU terminal): python scripts/check_tp_overlap.py
Exit 0 = budget holds for both model families.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_engine_with_topology_mesh(model, tp):
    """LLMEngine whose mesh is over v5e topology (non-addressable) devices;
    device placement helpers are stubbed so init never device_puts to them."""
    from jax.experimental import topologies

    from vllmini_tpu import config as cfgmod
    from vllmini_tpu.config import (CacheConfig, EngineConfig, ParallelConfig,
                                    SchedulerConfig)
    from vllmini_tpu.engine import engine as engmod
    from vllmini_tpu.parallel import mesh as meshmod
    from vllmini_tpu.parallel import tp as tpmod

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    devices = list(topo.devices)[:tp]
    grid = np.asarray(devices).reshape(1, tp)
    topo_mesh = jax.sharding.Mesh(grid, (meshmod.DATA_AXIS,
                                         meshmod.MODEL_AXIS))

    orig_make_mesh = meshmod.make_mesh
    orig_put = tpmod._put_weight
    orig_shard_pool = tpmod.shard_pool
    meshmod.make_mesh = lambda *a, **k: topo_mesh

    def abstract_put(x, sharding):
        # Shardings must be ATTACHED (param_specs reads them back for the
        # shard_map in_specs) but placement on topology devices is
        # impossible — an abstract array carries the sharding without one.
        if x is None:
            return None
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    def abstract_shard_pool(pool, mesh):
        import dataclasses as dc

        from jax.sharding import NamedSharding, PartitionSpec as P
        s = NamedSharding(mesh, P(meshmod.DATA_AXIS, None, None,
                                  meshmod.MODEL_AXIS))
        ssc = NamedSharding(mesh, P(meshmod.DATA_AXIS, None,
                                    meshmod.MODEL_AXIS, None))
        return dc.replace(
            pool,
            kv_pages=[jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)
                      for x in pool.kv_pages],
            kv_scales=(None if pool.kv_scales is None else
                       [jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=ssc)
                        for x in pool.kv_scales]))

    tpmod._put_weight = abstract_put
    tpmod.shard_pool = abstract_shard_pool
    try:
        cfg = EngineConfig(
            model=model,
            cache=CacheConfig(num_pages=64, page_size=32,
                              max_pages_per_seq=8, kv_dtype="bfloat16"),
            scheduler=SchedulerConfig(max_decode_slots=8,
                                      decode_chunk_steps=4,
                                      prefill_buckets=(32, 64)),
            parallel=ParallelConfig(tensor_parallel=tp),
            hf_model=None,
        )
        return engmod.LLMEngine(cfg)
    finally:
        meshmod.make_mesh = orig_make_mesh
        tpmod._put_weight = orig_put
        tpmod.shard_pool = orig_shard_pool


def abstract(tree):
    def conv(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            return x
        return jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype)
    return jax.tree.map(conv, tree)


def collective_counts(hlo: str):
    out = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
               "collective-permute"):
        out[op] = len(re.findall(rf"= \S+ {op}(?:-start)?\(", hlo))
    out["all-reduce-start"] = len(re.findall(r"all-reduce-start", hlo))
    return out


def payload_bytes(hlo: str):
    """Shapes of all all-reduce results, in bytes."""
    sizes = []
    for m in re.finditer(r"= (\S+)\[([\d,]*)\][^=]*all-reduce(?:-start)?\(",
                         hlo):
        dt, dims = m.group(1), m.group(2)
        item = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "s8": 1}.get(dt, 4)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sizes.append(n * item)
    return sizes


def check(model, name):
    tp = 2
    engine = build_engine_with_topology_mesh(model, tp)
    budget = jax.ShapeDtypeStruct((engine.max_slots,), jnp.int32)
    tables = jax.ShapeDtypeStruct(
        (engine.max_slots, engine.pages_per_seq_max), jnp.int32)
    lowered = engine._chunk_fn.lower(
        abstract(engine.params), abstract(engine.pool),
        abstract(engine.state), tables, budget, steps=1)
    hlo = lowered.compile().as_text()
    counts = collective_counts(hlo)
    sizes = payload_bytes(hlo)
    expected = 2 * model.num_layers
    print(f"{name}: {counts}  payload bytes per all-reduce: "
          f"{sorted(set(sizes))}", flush=True)
    assert counts["all-reduce"] == expected, counts
    for op in ("all-gather", "reduce-scatter", "all-to-all"):
        assert counts[op] == 0, counts
    # Residual-sized payloads only: nothing bulky (weights/KV) is reduced.
    B = engine.max_slots
    cap = B * model.hidden_size * 4 * 4  # generous: 4x f32 residual
    assert all(s <= cap for s in sizes), (sizes, cap)
    return counts


def main():
    from vllmini_tpu.config import ModelConfig
    llama = ModelConfig(family="llama", vocab_size=512, hidden_size=256,
                        num_layers=2, num_heads=4, num_kv_heads=2,
                        intermediate_size=512, max_position_embeddings=256,
                        tie_word_embeddings=False, dtype="bfloat16")
    gpt2 = ModelConfig(family="gpt2", vocab_size=512, hidden_size=256,
                       num_layers=2, num_heads=2,
                       max_position_embeddings=256, dtype="bfloat16")
    check(llama, "llama tp=2 (v5e AOT)")
    check(gpt2, "gpt2 tp=2 (v5e AOT)")
    print("TP collective budget holds under the real v5e compiler.")


if __name__ == "__main__":
    main()
