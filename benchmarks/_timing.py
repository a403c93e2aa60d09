"""Tunnel-aware timing shared by the benchmark scripts.

The bench.py methodology (CLAUDE.md): chain iterations through a REAL
data dependency, fetch ONE scalar at the end (wall = k * device_time +
one round trip), difference two chain lengths, and report the MEDIAN of
positive marginal estimates — min keeps co-tenancy artifacts (a short
chain timed during a busy period and a long chain during a free one
yields a bogus low marginal), and all-negative rounds are resampled up
to a cap instead of looping forever.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple


def marginal_time(
    run_chain: Callable[[int], float],
    reps: Tuple[int, int] = (5, 25),
    min_rounds: int = 3,
    max_rounds: int = 12,
) -> Tuple[float, Sequence[float]]:
    """run_chain(k) -> wall seconds for a k-iteration chained run (the
    caller builds the data dependency and the single final fetch).
    Returns (median positive per-iteration marginal, all raw estimates).
    Raises RuntimeError when max_rounds produce no positive marginal —
    chip timing is then unusable (co-tenancy or backend degradation)
    and a capped failure beats a silent hang."""
    estimates = []
    for _ in range(max_rounds):
        t1 = run_chain(reps[0])
        t2 = run_chain(reps[1])
        estimates.append((t2 - t1) / (reps[1] - reps[0]))
        positive = sorted(e for e in estimates if e > 0)
        if len(estimates) >= min_rounds and positive:
            return positive[len(positive) // 2], estimates
    raise RuntimeError(
        f"no positive marginal in {max_rounds} rounds "
        f"(estimates: {estimates}); chip timing unusable right now")
