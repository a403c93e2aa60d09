"""Evaluation metrics: WER / CER (ErrorRateStats) and accuracy.

Capability parity with speechbrain.utils.metric_stats.ErrorRateStats
(branchformer yaml:346, AISHELL yaml:292-297 `split_tokens: True` for CER)
and AccuracyStats (yaml:347). Host-side (decode outputs are strings /
token lists); the edit distance is a plain numpy DP."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np


def edit_distance(ref: Sequence, hyp: Sequence) -> dict:
    """Levenshtein alignment counts: {ins, del, sub, num_ref}."""
    m, n = len(ref), len(hyp)
    dp = np.zeros((m + 1, n + 1), np.int32)
    dp[:, 0] = np.arange(m + 1)
    dp[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            dp[i, j] = min(dp[i - 1, j] + 1,       # deletion
                           dp[i, j - 1] + 1,       # insertion
                           dp[i - 1, j - 1] + cost)
    # backtrack for counts
    i, j = m, n
    ins = dels = subs = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] + (
            0 if ref[i - 1] == hyp[j - 1] else 1
        ):
            if ref[i - 1] != hyp[j - 1]:
                subs += 1
            i, j = i - 1, j - 1
        elif j > 0 and dp[i, j] == dp[i, j - 1] + 1:
            ins += 1
            j -= 1
        else:
            dels += 1
            i -= 1
    return {"ins": ins, "del": dels, "sub": subs, "num_ref": m}


@dataclass
class ErrorRateStats:
    """Accumulates WER (or CER with split_tokens) over utterances."""

    split_tokens: bool = False
    remove_spaces: bool = False
    _counts: dict = field(default_factory=lambda: {
        "ins": 0, "del": 0, "sub": 0, "num_ref": 0, "num_sent": 0, "err_sent": 0,
    })

    def _prep(self, tokens):
        if isinstance(tokens, str):
            tokens = tokens.split()
        if self.split_tokens:
            joined = "".join(str(t) for t in tokens)
            if self.remove_spaces:
                joined = joined.replace(" ", "").replace("_", "").replace("▁", "")
            return list(joined)
        return list(tokens)

    def append(self, refs: List, hyps: List):
        for ref, hyp in zip(refs, hyps):
            r, h = self._prep(ref), self._prep(hyp)
            d = edit_distance(r, h)
            for k in ("ins", "del", "sub", "num_ref"):
                self._counts[k] += d[k]
            self._counts["num_sent"] += 1
            self._counts["err_sent"] += int(d["ins"] + d["del"] + d["sub"] > 0)

    def summarize(self) -> dict:
        c = self._counts
        errs = c["ins"] + c["del"] + c["sub"]
        wer = 100.0 * errs / max(c["num_ref"], 1)
        ser = 100.0 * c["err_sent"] / max(c["num_sent"], 1)
        return {
            "WER": wer, "SER": ser,
            "insertions": c["ins"], "deletions": c["del"],
            "substitutions": c["sub"], "num_ref_tokens": c["num_ref"],
            "num_sentences": c["num_sent"],
        }


@dataclass
class AccuracyStats:
    """Token-level teacher-forced accuracy (speechbrain AccuracyStats)."""

    correct: int = 0
    total: int = 0

    def append(self, log_probs: np.ndarray, targets: np.ndarray,
               lengths: np.ndarray | None = None):
        """log_probs [B, U, V]; targets [B, U]; lengths [B] absolute."""
        pred = np.asarray(log_probs).argmax(-1)
        targets = np.asarray(targets)
        if lengths is None:
            mask = np.ones_like(targets, bool)
        else:
            mask = np.arange(targets.shape[1])[None, :] < np.asarray(lengths)[:, None]
        self.correct += int(((pred == targets) & mask).sum())
        self.total += int(mask.sum())

    def summarize(self) -> float:
        return self.correct / max(self.total, 1)
