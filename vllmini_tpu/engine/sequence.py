"""Per-request sequence state.

The reference keeps this in four parallel dicts on the scheduler
(`/root/reference/vllmini/scheduler.py:17-20`) and ships a dead `SequenceManager`
(`sequence_manager.py`, imported nowhere — SURVEY.md §1). Here it is one live
dataclass owned by the scheduler.
"""

from __future__ import annotations

import dataclasses
import enum
import itertools
import time
from typing import List, Optional

from ..config import SamplingParams

_seq_counter = itertools.count(1)


class SequenceState(enum.Enum):
    WAITING = "waiting"      # queued, no KV allocated
    RUNNING = "running"      # holds a decode slot + KV pages
    SWAPPED = "swapped"      # preempted; KV on host, no pages
    FINISHED = "finished"
    FAILED = "failed"


class FinishReason(enum.Enum):
    STOP_TOKEN = "stop_token"
    MAX_NEW_TOKENS = "max_new_tokens"
    MAX_CONTEXT = "max_context"
    ABORTED = "aborted"


@dataclasses.dataclass
class Sequence:
    prompt_ids: List[int]
    sampling: SamplingParams
    seq_id: int = dataclasses.field(default_factory=lambda: next(_seq_counter))
    arrival_time: float = dataclasses.field(default_factory=time.monotonic)
    output_ids: List[int] = dataclasses.field(default_factory=list)
    # log-prob of each generated token (parallel to output_ids; OpenAI
    # `logprobs` surface — captured on device at sample time).
    output_logprobs: List[float] = dataclasses.field(default_factory=list)
    # logprobs of generated tokens that recompute-preemption folded into
    # prompt_ids (generated_logprobs() = absorbed + output).
    absorbed_logprobs: List[float] = dataclasses.field(default_factory=list)
    state: SequenceState = SequenceState.WAITING
    finish_reason: Optional[FinishReason] = None
    slot: Optional[int] = None       # decode slot while RUNNING
    tokens_in_kv: int = 0            # KV entries committed to the pool
    last_token: Optional[int] = None  # sampled but not yet in KV
    # set when admitted; used for preemption ordering (newest first)
    admission_index: int = 0
    # Original prompt length: survives recompute-preemption, where generated
    # tokens are folded into prompt_ids for re-prefill.
    orig_prompt_len: int = -1
    # Effective RNG seed (SamplingParams.seed or a deterministic default),
    # assigned at first admission so swap-in/recompute resume the SAME
    # sampling stream.
    rng_seed: Optional[int] = None
    # monotonic() timestamp set when finished (result-GC bookkeeping).
    finish_time: float = 0.0
    # n-best sampling: sibling sequences forked off this one's prefill
    # (copy-on-write KV sharing); set on the parent at add_request and
    # cleared once admitted. `fork_group` keeps the ids permanently.
    fork_children: List["Sequence"] = dataclasses.field(
        default_factory=list)
    fork_group: List[int] = dataclasses.field(default_factory=list)

    def __post_init__(self):
        if self.orig_prompt_len < 0:
            self.orig_prompt_len = len(self.prompt_ids)

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_ids) + len(self.output_ids)

    @property
    def num_generated(self) -> int:
        """Tokens generated beyond the user's original prompt (committed)."""
        return self.num_tokens - self.orig_prompt_len

    def generated_ids(self) -> List[int]:
        return self.all_token_ids()[self.orig_prompt_len:]

    def generated_logprobs(self) -> List[float]:
        """Log-probs parallel to generated_ids(): tokens absorbed into
        prompt_ids by recompute-preemption keep theirs via
        `absorbed_logprobs`."""
        return list(self.absorbed_logprobs) + list(self.output_logprobs)

    @property
    def is_finished(self) -> bool:
        return self.state in (SequenceState.FINISHED, SequenceState.FAILED)

    def all_token_ids(self) -> List[int]:
        return list(self.prompt_ids) + list(self.output_ids)
