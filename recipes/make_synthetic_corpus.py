"""Generate the synthetic tone-word corpus used for end-to-end validation
(benchmarks/RESULTS.md "End-to-end convergence on TPU").

Each word of a small vocabulary is a fixed tone sequence; utterances are
2-4 words. No real speech ships in this offline environment, so this
corpus is the e2e stand-in: a model that learns the tone->word mapping
exercises the full pipeline (wav files -> native loader -> bucketing ->
fbank -> encoder -> CTC -> decode -> WER) with a known-reachable 0% WER.

Usage: python recipes/make_synthetic_corpus.py OUT_DIR [--n 200] [--seed 0]
Writes OUT_DIR/utt*.wav + OUT_DIR/manifest.csv (ID,duration,wav,spk_id,wrd).
"""

from __future__ import annotations

import argparse
import csv
import os
import wave

import numpy as np

WORDS = ["ba", "do", "ki", "lu", "me", "ta"]


def write_wav(path: str, audio: np.ndarray, sr: int) -> None:
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sr", type=int, default=16000)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    sr = args.sr
    word_dur = 0.3
    t = np.arange(int(word_dur * sr)) / sr
    rows = []
    for i in range(args.n):
        n_words = int(rng.integers(2, 5))
        labels = rng.integers(0, len(WORDS), n_words)
        text = " ".join(WORDS[k] for k in labels)
        audio = np.concatenate([
            0.5 * np.sin(2 * np.pi * (350 + 140 * k) * t) for k in labels
        ])
        path = os.path.join(args.out_dir, f"utt{i}.wav")
        write_wav(path, audio, sr)
        rows.append({"ID": f"utt{i}", "duration": n_words * word_dur,
                     "wav": path, "spk_id": "spk0", "wrd": text})
    manifest = os.path.join(args.out_dir, "manifest.csv")
    with open(manifest, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["ID", "duration", "wav", "spk_id",
                                          "wrd"])
        w.writeheader()
        w.writerows(rows)
    print(manifest)


if __name__ == "__main__":
    main()
