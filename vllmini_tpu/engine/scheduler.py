"""Continuous-batching scheduler.

Reference counterpart: `/root/reference/vllmini/scheduler.py`. The reference's loop
is FCFS-run-to-completion: re-queued items keep their arrival key, so the earliest
sequence decodes to COMPLETION before any other starts (`scheduler.py:25,104` —
head-of-line blocking, SURVEY.md "bugs"). This scheduler does real continuous
batching:

- a fixed set of decode slots advances every tick in ONE batched forward;
- new requests are admitted into free slots on token boundaries (prefill runs
  between decode ticks);
- on page-pool exhaustion the most-recently-admitted running sequence is
  preempted (the reference's eviction policy, `scheduler.py:117-130`) and its KV
  is swapped to host RAM or dropped for recompute per SchedulerConfig;
- swapped/preempted sequences re-enter ahead of new arrivals once pages free up.

Per-request `max_new_tokens` is honored (the reference accepts it then ignores it,
`server.py:13-14` vs `:50`).
"""

from __future__ import annotations

import logging
from collections import deque
from typing import Deque, Dict, List, Optional

from ..config import EngineConfig, SamplingParams
from ..memory.allocator import OutOfPages
from .engine import LLMEngine
from .sequence import FinishReason, Sequence, SequenceState

logger = logging.getLogger("vllmini_tpu.scheduler")


class Scheduler:
    def __init__(self, engine: LLMEngine):
        self.engine = engine
        self.config: EngineConfig = engine.config
        self.waiting: Deque[Sequence] = deque()
        self.swapped: Deque[Sequence] = deque()
        self.slots: List[Optional[Sequence]] = [None] * engine.max_slots
        self.sequences: Dict[int, Sequence] = {}
        self._admission_counter = 0
        self._max_total_tokens = min(
            self.config.cache.max_context_len,
            self.config.model.max_position_embeddings)

    # ------------------------------------------------------------------ intake

    def add_request(self, prompt_ids: List[int],
                    sampling: Optional[SamplingParams] = None) -> int:
        if len(self.waiting) >= self.config.scheduler.max_queued_requests:
            raise RuntimeError("request queue full")
        if not prompt_ids:
            raise ValueError("empty prompt")
        if len(prompt_ids) >= self._max_total_tokens:
            raise ValueError(
                f"prompt length {len(prompt_ids)} >= max context "
                f"{self._max_total_tokens}")
        seq = Sequence(prompt_ids=list(prompt_ids),
                       sampling=sampling or SamplingParams())
        self.sequences[seq.seq_id] = seq
        self.waiting.append(seq)
        return seq.seq_id

    def abort(self, seq_id: int) -> bool:
        seq = self.sequences.get(seq_id)
        if seq is None or seq.is_finished:
            return False
        self._finish(seq, FinishReason.ABORTED)
        return True

    def get(self, seq_id: int) -> Optional[Sequence]:
        return self.sequences.get(seq_id)

    def pop_finished(self, seq_id: int) -> Optional[Sequence]:
        seq = self.sequences.get(seq_id)
        if seq is not None and seq.is_finished:
            del self.sequences[seq_id]
        return seq

    @property
    def has_work(self) -> bool:
        return (bool(self.waiting) or bool(self.swapped)
                or any(s is not None for s in self.slots))

    @property
    def num_running(self) -> int:
        return sum(s is not None for s in self.slots)

    # ----------------------------------------------------------------- helpers

    def _free_slot(self) -> Optional[int]:
        for i, s in enumerate(self.slots):
            if s is None:
                return i
        return None

    def _finish(self, seq: Sequence, reason: FinishReason) -> None:
        self.engine.free_sequence(seq)
        if seq.slot is not None:
            self.slots[seq.slot] = None
            seq.slot = None
        if seq in self.waiting:
            self.waiting.remove(seq)
        if seq in self.swapped:
            self.swapped.remove(seq)
        seq.state = SequenceState.FINISHED
        seq.finish_reason = reason
        self.engine.metrics.counter("finished_requests", 1)

    def _admit(self, seq: Sequence, slot: int, *, from_swap: bool) -> None:
        if from_swap:
            self.engine.swap_in(seq)
        else:
            self.engine.prefill(seq)
        seq.slot = slot
        seq.state = SequenceState.RUNNING
        self._admission_counter += 1
        seq.admission_index = self._admission_counter
        self.slots[slot] = seq

    def _preempt_newest(self, exclude: Optional[Sequence] = None) -> bool:
        """Preempt the most-recently-admitted running sequence. Returns False if
        no victim exists."""
        victim = None
        for s in self.slots:
            if s is None or s is exclude:
                continue
            if victim is None or s.admission_index > victim.admission_index:
                victim = s
        if victim is None:
            return False
        mode = self.config.scheduler.preemption_mode
        logger.info("preempting seq %d (%s)", victim.seq_id, mode)
        if mode == "swap":
            self.engine.swap_out(victim)
            victim.state = SequenceState.SWAPPED
            self.slots[victim.slot] = None
            victim.slot = None
            self.swapped.appendleft(victim)
        else:  # recompute: drop KV, re-prefill later with prompt+output so far
            self.engine.free_sequence(victim)
            victim.prompt_ids = victim.all_token_ids()
            if victim.last_token is not None:
                victim.prompt_ids.append(victim.last_token)
                victim.last_token = None
            victim.output_ids = []
            victim.tokens_in_kv = 0
            victim.state = SequenceState.WAITING
            self.slots[victim.slot] = None
            victim.slot = None
            self.waiting.appendleft(victim)
        self.engine.metrics.counter("preemptions", 1)
        return True

    # -------------------------------------------------------------------- step

    def step(self) -> List[Sequence]:
        """One engine tick: admit, decode one token for all running sequences.

        Returns sequences that finished during this tick.
        """
        finished: List[Sequence] = []

        # 1. Re-admit swapped sequences first (they hold partial results).
        while self.swapped:
            slot = self._free_slot()
            if slot is None:
                break
            seq = self.swapped[0]
            if not self.engine.can_swap_in(seq):
                break
            self.swapped.popleft()
            self._admit(seq, slot, from_swap=True)

        # 2. Admit new requests into free slots.
        while self.waiting:
            slot = self._free_slot()
            if slot is None:
                break
            seq = self.waiting[0]
            if not self.engine.allocator.can_allocate(len(seq.prompt_ids)):
                break
            self.waiting.popleft()
            try:
                self._admit(seq, slot, from_swap=False)
            except OutOfPages:
                # Raced against concurrent growth; push back and stop admitting.
                self.waiting.appendleft(seq)
                seq.slot = None
                break
            if seq.last_token is not None and self._check_finish(seq):
                finished.append(seq)

        # 3. Grow each running sequence by one page slot if needed; preempt on
        #    exhaustion.
        for seq in list(self.slots):
            if seq is None:
                continue
            if seq.state != SequenceState.RUNNING:
                # Preempted by an earlier iteration of this very loop.
                continue
            while True:
                try:
                    self.engine.allocator.append_token(seq.seq_id)
                    break
                except OutOfPages:
                    if not self._preempt_newest(exclude=seq):
                        # A single sequence exhausted the whole pool: cannot
                        # make progress, surface as an aborted request rather
                        # than wedging the engine.
                        logger.error(
                            "seq %d: page pool exhausted with no preemption "
                            "victim; aborting request", seq.seq_id)
                        self._finish(seq, FinishReason.ABORTED)
                        finished.append(seq)
                        break
                except ValueError:
                    # exceeded per-seq max context
                    self._finish(seq, FinishReason.MAX_CONTEXT)
                    finished.append(seq)
                    break

        # 4. Batched decode over all active slots.
        if any(s is not None for s in self.slots):
            self.engine.decode(self.slots)
            for seq in list(self.slots):
                if seq is None:
                    continue
                if self._check_finish(seq):
                    finished.append(seq)
        return finished

    def _check_finish(self, seq: Sequence) -> bool:
        s = seq.sampling
        # The latest sample is in seq.last_token (not yet committed to KV).
        stop_ids = set(s.stop_token_ids)
        if seq.last_token is not None and seq.last_token in stop_ids:
            # Don't emit the stop token.
            self._finish(seq, FinishReason.STOP_TOKEN)
            return True
        if seq.num_generated >= s.max_new_tokens:
            self._finish(seq, FinishReason.MAX_NEW_TOKENS)
            return True
        if seq.num_tokens + 1 >= self._max_total_tokens:
            # +1: the pending last_token would exceed the context budget.
            seq.output_ids.append(seq.last_token)
            seq.last_token = None
            self._finish(seq, FinishReason.MAX_CONTEXT)
            return True
        return False

    # ------------------------------------------------------------ run helpers

    def run_to_completion(self, max_steps: int = 100000) -> None:
        steps = 0
        while self.has_work and steps < max_steps:
            self.step()
            steps += 1
        if self.has_work:
            raise RuntimeError("scheduler did not drain")
