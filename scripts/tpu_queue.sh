#!/bin/bash
# One-shot TPU work queue: run everything that was blocked on the axon tunnel
# the moment it comes back. Each step logs to /tmp/tpuq/ and is individually
# timeout-guarded so one hang doesn't eat the window. Interpret results by
# reading the logs — this script only captures.
#
# Usage:  bash scripts/tpu_queue.sh            # full queue
#         bash scripts/tpu_queue.sh bench      # just the bench configs
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpuq
mkdir -p "$LOG"
cd /root/repo

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "    exit=$? (log: $LOG/$name.log)"
}

echo "probe..."
if ! timeout 120 python -c "import jax; print(jax.devices())" \
    > "$LOG/probe.log" 2>&1; then
  echo "TUNNEL STILL DOWN — aborting queue"; exit 1
fi
cat "$LOG/probe.log"

only=${1:-all}

if [ "$only" = all ] || [ "$only" = native ]; then
  # Every kernel path natively (the on-chip gate, VERDICT r3 #2).
  step native_smoke 1800 python scripts/native_smoke.py
  # New-kernel-mode legalization check (vector i32 rem in blocksparse).
  step native_blocksparse 900 python scripts/native_check_blocksparse.py
  # int4 unpack-mode legalization incl. the burst-prefill M=512 case.
  step probe_qmm_modes 1200 python scripts/probe_qmm_modes.py
  # Real-v5e-compiler collective budget for the TP decode step (AOT).
  step check_tp_overlap 1200 python scripts/check_tp_overlap.py
fi

if [ "$only" = all ] || [ "$only" = qmm ]; then
  # int4 unpack winner A/B (i32 vs f32; bf16 cannot compile on v5e).
  step bench_qmm 1800 python scripts/bench_qmm.py
fi

if [ "$only" = all ] || [ "$only" = gate ]; then
  # Gate model: TPU training is ~2 min/700 steps; resume from the CPU-trained
  # checkpoint to deepen the minimum, then score the trained gate section.
  step gate_resume 1800 env GATE_TRAIN_RESUME=1 GATE_TRAIN_STEPS=700 \
      python scripts/train_gate_model.py
  step ppl_trained 3600 python scripts/ppl_report.py
fi

if [ "$only" = all ] || [ "$only" = bench ]; then
  step bench_gpt2 2400 python bench.py
  step bench_gpt2_int8 2400 env VLLMINI_BENCH_MODEL=gpt2-int8 python bench.py
  step bench_gpt2_int4 2400 env VLLMINI_BENCH_MODEL=gpt2-int8 \
      VLLMINI_BENCH_WQ=int4 python bench.py
  step bench_gpt2xl_int8kv 2400 env VLLMINI_BENCH_MODEL=gpt2-xl python bench.py
  step bench_8b 3600 env VLLMINI_BENCH_MODEL=llama3-8b VLLMINI_BENCH_SLOTS=32 \
      python bench.py
  step bench_spec 2400 env VLLMINI_BENCH_SPEC=4 python bench.py
fi

if [ "$only" = all ] || [ "$only" = trace ]; then
  step trace_8b 3600 python scripts/trace_decode.py llama3-8b
fi

echo "=== queue done; grep the JSON lines: ==="
grep -h '"metric"' "$LOG"/bench_*.log 2>/dev/null
