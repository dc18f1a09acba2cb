"""Server entrypoint: `python -m vllmini_tpu.server.main [--model gpt2 ...]`.

Reference counterpart: `/root/reference/vllmini/main.py` + the hardcoded bootstrap
in `server.py:28-62`. Everything the reference hardcodes is a flag here.
"""

from __future__ import annotations

import argparse
import logging

from ..config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    QuantConfig,
    SchedulerConfig,
)


def build_engine_config(args) -> EngineConfig:
    presets = {
        "gpt2": ModelConfig.gpt2_124m,
        "gpt2-xl": ModelConfig.gpt2_xl,
        "llama3-8b": ModelConfig.llama3_8b,
        "llama3-70b": ModelConfig.llama3_70b,
        "mistral-7b": ModelConfig.mistral_7b,
        "qwen2-7b": ModelConfig.qwen2_7b,
        "mixtral-8x7b": ModelConfig.mixtral_8x7b,
    }
    if args.model in presets:
        model = presets[args.model](dtype=args.dtype)
    else:
        # Treat as HF id/path; config is derived at load time.
        model = ModelConfig.gpt2_124m(dtype=args.dtype)
    return EngineConfig(
        model=model,
        cache=CacheConfig(num_pages=args.num_pages, page_size=args.page_size,
                          max_pages_per_seq=args.max_pages_per_seq,
                          kv_dtype=args.kv_dtype,
                          enable_prefix_cache=args.prefix_caching),
        scheduler=SchedulerConfig(max_decode_slots=args.max_decode_slots,
                                  decode_chunk_steps=args.decode_chunk_steps,
                                  pipeline_depth=args.pipeline_depth,
                                  preemption_mode=args.preemption,
                                  speculative_tokens=args.speculative_tokens,
                                  speculative_ngram=args.speculative_ngram),
        quant=QuantConfig(weight_dtype=args.weight_dtype),
        parallel=ParallelConfig(tensor_parallel=args.tensor_parallel,
                                data_parallel=args.data_parallel),
        hf_model=args.hf_model or args.model,
    )


def main(argv=None):
    p = argparse.ArgumentParser("vllmini-tpu server")
    p.add_argument("--model", default="gpt2")
    p.add_argument("--hf-model", default=None,
                   help="HF id/path for weights+tokenizer (default: --model)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--kv-dtype", default="bfloat16",
                   choices=["bfloat16", "float16", "float32", "int8",
                            "fp8_e4m3", "fp8_e5m2"])
    p.add_argument("--weight-dtype", default="none",
                   choices=["none", "int8", "int4", "w8a8", "w4a8"])
    p.add_argument("--num-pages", type=int, default=2048)
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--max-pages-per-seq", type=int, default=64)
    p.add_argument("--prefix-caching", action="store_true",
                   help="reuse KV pages across requests sharing a "
                        "page-aligned prompt prefix (copy-on-write, "
                        "LRU-evicted under pool pressure)")
    p.add_argument("--max-decode-slots", type=int, default=8)
    p.add_argument("--decode-chunk-steps", type=int, default=16)
    p.add_argument("--pipeline-depth", type=int, default=4,
                   help="decode chunks in flight (1 = synchronous ticks)")
    p.add_argument("--speculative-tokens", type=int, default=0,
                   help="n-gram speculative decoding: drafts per decode step "
                        "(0 disables; output stays bit-identical)")
    p.add_argument("--speculative-ngram", type=int, default=3,
                   help="suffix n-gram length used for prompt-lookup drafts")
    p.add_argument("--preemption", default="swap",
                   choices=["swap", "recompute"])
    p.add_argument("--tensor-parallel", type=int, default=1)
    p.add_argument("--data-parallel", type=int, default=1,
                   help="decode slots + page pool shard over this many "
                        "data replicas on the mesh (max_decode_slots is the "
                        "GLOBAL slot count and must divide it)")
    # Multi-host serving (BASELINE config 5): process 0 owns the HTTP server,
    # scheduler, and allocator; workers replay its device-command stream.
    p.add_argument("--num-processes", type=int, default=1,
                   help="hosts in the slice (1 = single-host)")
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for jax.distributed")
    p.add_argument("--tokenizer-dir", default=None,
                   help="directory with hub-format vocab.json + merges.txt; "
                        "serves a real byte-level BPE without network access "
                        "(utils/bpe.py)")
    p.add_argument("--random-weights", action="store_true",
                   help="skip HF loading (random init; for smoke tests)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    from ..parallel.multihost import initialize_distributed

    initialize_distributed(coordinator_address=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)

    from ..engine.engine import LLMEngine
    from ..engine.scheduler import Scheduler
    from .api import create_app

    config = build_engine_config(args)
    params = None
    tokenizer = None
    if not args.random_weights:
        from ..models.loader import load_params
        import transformers

        import dataclasses

        model_cfg, params = load_params(config.hf_model)
        config = dataclasses.replace(config, model=model_cfg)
        tokenizer = transformers.AutoTokenizer.from_pretrained(config.hf_model)
    if tokenizer is None and args.tokenizer_dir:
        import os

        from ..utils.bpe import ByteBPETokenizer

        tokenizer = ByteBPETokenizer.from_files(
            os.path.join(args.tokenizer_dir, "vocab.json"),
            os.path.join(args.tokenizer_dir, "merges.txt"))
    if tokenizer is None:
        class _IdTokenizer:
            eos_token_id = None

            def encode(self, s):
                # Numeric words map directly; anything else (e.g. chat
                # template role tags) to a stable byte-sum id.
                V = config.model.vocab_size
                return [int(t) % V if t.lstrip("-").isdigit()
                        else sum(t.encode()) % V for t in s.split()]

            def decode(self, ids):
                return " ".join(map(str, ids))

        tokenizer = _IdTokenizer()

    if args.weight_dtype != "none":
        from ..ops.quant_matmul import quantize_params

        if params is None:  # --random-weights: materialize, then quantize
            import jax

            from ..models.registry import get_family

            params = get_family(config.model).init_params(
                config.model, jax.random.PRNGKey(config.seed))
        if config.model.family == "gpt2":
            # Tied-head models: split the head off the embedding table so it
            # quantizes too (the logits matmul streams the whole table every
            # step; the embedding gather stays full precision).
            from ..models.gpt2 import untie_lm_head
            params = untie_lm_head(params)
        params = quantize_params(params, config.quant,
                                 model_config=config.model)

    engine = LLMEngine(config, params)

    if args.num_processes > 1 and args.process_id != 0:
        # Worker host: no HTTP, no scheduler — replay the primary's
        # device-command stream until shutdown.
        from ..parallel.multihost import WorkerDriver

        WorkerDriver(engine).run_forever()
        return

    scheduler = Scheduler(engine)
    driver = None
    if args.num_processes > 1:
        from ..parallel.multihost import PrimaryDriver

        driver = PrimaryDriver(scheduler)
    app = create_app(scheduler, tokenizer, driver=driver)

    from .api import run_app

    run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
