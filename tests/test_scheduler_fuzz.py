"""Randomized scheduler fuzz: a seeded interleaving of admissions, steps,
and aborts under a page-starved pool must (a) never corrupt accounting and
(b) leave every surviving request's greedy output BIT-IDENTICAL to the
same prompt run alone on an ample scheduler.

This is the invariant the whole serving stack rests on: continuous
batching, chunked prefill, preemption (swap or recompute), aborts, and
result GC are all scheduling-time concerns that must be invisible in the
tokens. The reference has no analogous test (its scheduler tests check
bookkeeping only, `vllmini/tests/test_scheduler.py`).
"""

import random

import pytest

from tests.test_scheduler import TINY, make_sched
from vllmini_tpu.config import SamplingParams


def control_outputs(prompts):
    """Each prompt alone on an ample scheduler -> expected greedy ids."""
    expected = {}
    for pid, (ids, n) in prompts.items():
        sched = make_sched(num_pages=64, max_pages=16, slots=2)
        sid = sched.add_request(list(ids), SamplingParams(
            max_new_tokens=n, greedy=True))
        sched.run_to_completion()
        expected[pid] = list(sched.get(sid).output_ids)
    return expected


@pytest.mark.parametrize("mode,seed", [("swap", 0), ("recompute", 1)])
def test_fuzz_interleaving_matches_isolated_runs(mode, seed):
    rng = random.Random(seed)
    # Starved pool: 20 pages x 4 tokens, 2 slots -> constant preemption
    # pressure once a few 10-20-token sequences are live.
    sched = make_sched(num_pages=20, page_size=4, max_pages=8, slots=2,
                       preemption=mode)
    free0 = sched.engine.allocator.num_free_pages

    prompts = {}
    for pid in range(14):
        L = rng.randint(1, 20)
        ids = [rng.randint(0, TINY.vocab_size - 1) for _ in range(L)]
        prompts[pid] = (ids, rng.randint(1, 6))

    live = {}     # pid -> sid
    done = {}     # pid -> output_ids
    aborted = set()
    todo = list(prompts)
    steps = 0
    while (todo or live) and steps < 3000:
        steps += 1
        op = rng.random()
        if todo and (op < 0.35 or not live):
            pid = todo.pop(0)
            ids, n = prompts[pid]
            try:
                live[pid] = sched.add_request(list(ids), SamplingParams(
                    max_new_tokens=n, greedy=True))
            except RuntimeError:   # queue full -> retry later
                todo.insert(0, pid)
        elif live and op > 0.93:
            pid = rng.choice(sorted(live))
            sched.abort(live[pid])
            aborted.add(pid)
        else:
            sched.step()
        for pid in [p for p in live if p in aborted
                    or (sched.get(live[p]) is not None
                        and sched.get(live[p]).is_finished)]:
            sq = sched.pop_finished(live[pid])
            if pid not in aborted and sq is not None:
                done[pid] = list(sq.output_ids)
            live.pop(pid)
        assert sched.engine.allocator.num_free_pages >= 0
    assert not todo and not live, (len(todo), len(live), steps)

    # No page leaks once everything drained.
    sched.step()
    assert sched.engine.allocator.num_free_pages == free0

    # Bit-exactness of every non-aborted request vs its isolated run.
    survivors = {p: prompts[p] for p in done}
    expected = control_outputs(survivors)
    assert len(done) >= 5  # the fuzz must actually exercise completions
    for pid, out in done.items():
        assert out == expected[pid], (
            f"prompt {pid}: fuzzed={out} isolated={expected[pid]}")
