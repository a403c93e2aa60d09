"""Preemption-safe training: signal-driven graceful shutdown + wall-clock
budgets.

The reference's recovery story is periodic checkpoints + resume-on-restart
(SURVEY.md §5, `ckpt_interval_minutes`). On preemptible TPU fleets the
scheduler additionally sends SIGTERM with a short grace window before
reclaiming the VM; losing up to `ckpt_interval_minutes` of work on every
preemption is wasteful. This module turns that signal (and an optional
wall-clock budget, for schedulers that kill without warning at a known
deadline) into a clean end-of-step checkpoint + exit, which the existing
`CheckpointManager.restore` path resumes exactly.

Usage (recipes/train.py):

    stopper = TrainStopper(max_hours=args.max_hours)
    with stopper:
        for batch in ...:
            state, metrics = trainer.train_step(state, batch)
            if stopper.should_stop():
                ckpt.save(step, ..., force=True)
                return

A second SIGINT falls through to the default handler (hard exit) so an
interactive ^C ^C still kills a wedged run.
"""

from __future__ import annotations

import signal
import time
from typing import Optional


class TrainStopper:
    """Combines signal-requested shutdown with a wall-clock budget.

    Context manager; handlers are installed on __enter__ and restored on
    __exit__ so nested/sequential training stages don't leak handlers."""

    def __init__(self, max_hours: Optional[float] = None,
                 signals=(signal.SIGTERM, signal.SIGINT),
                 install: bool = False, sync_every: int = 10):
        self.max_hours = max_hours
        self.signals = signals
        self.requested = False
        self.signame: Optional[str] = None
        # multi-process runs OR-reduce stop signals across hosts every
        # `sync_every` steps (see should_stop)
        self.sync_every = max(sync_every, 1)
        self._start = time.monotonic()
        self._prev = {}
        if install:
            # CLI runs own the process for their lifetime; install now
            # and never restore (the context-manager form is for embedded
            # / test use)
            self.__enter__()

    def _handler(self, signum, frame):
        if self.requested and signum == signal.SIGINT:
            # second ^C: restore default behaviour and re-raise for a
            # hard exit
            signal.signal(signal.SIGINT, self._prev.get(signal.SIGINT,
                                                        signal.SIG_DFL))
            raise KeyboardInterrupt
        self.requested = True
        self.signame = signal.Signals(signum).name
        print(f"[preempt] {self.signame} received — will checkpoint and "
              "exit at the end of the current step", flush=True)

    def __enter__(self):
        self._start = time.monotonic()
        for s in self.signals:
            self._prev[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        return False

    def hours_elapsed(self) -> float:
        return (time.monotonic() - self._start) / 3600.0

    def over_budget(self) -> bool:
        return self.max_hours is not None \
            and self.hours_elapsed() >= self.max_hours

    def _local_stop(self) -> bool:
        if self.requested:
            return True
        if self.over_budget():
            print(f"[preempt] wall-clock budget ({self.max_hours} h) "
                  "reached — checkpointing and exiting", flush=True)
            self.requested = True  # latch, so the message prints once
            self.signame = "WALLCLOCK"
            return True
        return False

    def should_stop(self, step: Optional[int] = None) -> bool:
        """True when the run should checkpoint and exit.

        Multi-process runs: the checkpoint save a stop triggers is a
        COLLECTIVE (orbax barriers — training/checkpoint.py), so every
        process must stop at the SAME step. Local signals (SIGTERM can
        land on any one host; wall clocks skew) are therefore OR-reduced
        across processes, at a `sync_every`-step cadence so the hot loop
        doesn't pay a host-synchronizing collective every step. Pass the
        global step for the cadence; calls without a step synchronize
        every time."""
        import jax

        if jax.process_count() > 1:
            if step is not None and step % self.sync_every:
                return False  # NEVER stop on a local-only decision
            import numpy as np
            from jax.experimental import multihost_utils

            local = self._local_stop()
            agreed = bool(multihost_utils.process_allgather(
                np.asarray(local)).any())
            if agreed and not self.requested:
                self.requested = True
                self.signame = self.signame or "PEER"
            return agreed
        return self._local_stop()
