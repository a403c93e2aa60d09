"""Generate synthetic corpora for end-to-end validation
(benchmarks/RESULTS.md "End-to-end convergence on TPU").

Default (easy) corpus: each word of a 6-word vocabulary is a fixed pure
tone; utterances are 2-4 words; 0% WER is reachable, validating the
full pipeline (wav files -> native loader -> bucketing -> fbank ->
encoder -> CTC -> decode -> WER).

--hard corpus: a deliberately CONFUSABLE pseudo-language where decode
configurations differentiate (greedy < beam < beam + LM) instead of
saturating at 0%:

- ~60-word lexicon built from a 12-phoneme formant inventory with
  MINIMAL PAIRS (words differing in one phoneme);
- coarticulated synthesis: formants interpolate across phoneme
  boundaries, pitch-pulsed excitation with per-utterance speaker
  variation (pitch, formant scale, speed, level) + additive noise at a
  sampled SNR — so the acoustics are genuinely ambiguous;
- sentences sampled from a skewed BIGRAM language model, so a fusion LM
  trained on the train transcripts carries real disambiguation signal;
- disjoint train/dev/test splits (manifest_train/dev/test.csv) drawn
  from the same language.

No real speech ships in this offline environment; this is the
strongest WER-differentiation evidence the image permits.

Usage:
  python recipes/make_synthetic_corpus.py OUT_DIR [--n 200] [--seed 0]
  python recipes/make_synthetic_corpus.py OUT_DIR --hard [--n 1000]
Writes OUT_DIR/utt*.wav + manifest.csv (ID,duration,wav,spk_id,wrd);
--hard additionally writes manifest_{train,dev,test}.csv.
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


# ---------------------------------------------------------------------------
# --hard: confusable formant pseudo-language with bigram statistics
# ---------------------------------------------------------------------------

# 12 phonemes: (name, F1, F2) formant pairs on a compact grid so several
# pairs are acoustically close (confusable under noise)
PHONES = [
    ("a", 700, 1200), ("e", 500, 1800), ("i", 300, 2300), ("o", 500, 900),
    ("u", 350, 800), ("y", 320, 2100), ("r", 450, 1300), ("l", 420, 1500),
    ("n", 380, 1600), ("m", 360, 1100), ("s", 600, 2000), ("k", 650, 1700),
]


def _build_lexicon(rng, n_words=60, phones_lo=2, phones_hi=4):
    """Words of phones_lo..phones_hi phonemes; half the lexicon is
    generated as MINIMAL PAIRS of an earlier word (one phoneme substituted
    by a near neighbour), so the acoustic space is crowded on purpose."""
    words, seen = [], set()
    while len(words) < n_words // 2:
        w = tuple(rng.integers(0, len(PHONES),
                               int(rng.integers(phones_lo, phones_hi + 1))))
        if w not in seen:
            seen.add(w)
            words.append(w)
    while len(words) < n_words:
        base = words[int(rng.integers(0, n_words // 2))]
        pos = int(rng.integers(0, len(base)))
        # neighbour on the phone grid = acoustically close substitute
        sub = (base[pos] + int(rng.choice([-1, 1]))) % len(PHONES)
        w = base[:pos] + (sub,) + base[pos + 1:]
        if w not in seen:
            seen.add(w)
            words.append(w)
    names = ["".join(PHONES[p][0] for p in w) for w in words]
    return words, names


def _bigram_lm(rng, n_words):
    """Skewed unigram (Zipf) + sparse bigram transitions: each word has
    ~6 plausible successors. This is the structure a fusion LM learns."""
    uni = 1.0 / (np.arange(1, n_words + 1) ** 1.1)
    uni = uni / uni.sum()
    trans = np.zeros((n_words, n_words))
    for i in range(n_words):
        succ = rng.choice(n_words, size=6, replace=False, p=uni)
        w = rng.dirichlet(np.ones(6) * 0.8)
        trans[i, succ] = w
    return uni, trans


def _sample_sentence(rng, uni, trans, lo=3, hi=8):
    n = int(rng.integers(lo, hi + 1))
    out = [int(rng.choice(len(uni), p=uni))]
    while len(out) < n:
        out.append(int(rng.choice(len(uni), p=trans[out[-1]])))
    return out


def _synth_utterance(rng, phone_seq, sr):
    """Coarticulated two-formant synthesis with pitch pulses, speaker
    variation, and additive noise."""
    pitch = float(rng.uniform(90, 180))          # speaker f0
    fscale = float(rng.uniform(0.92, 1.08))      # vocal-tract length
    speed = float(rng.uniform(0.9, 1.1))
    phone_dur = 0.12 * speed
    n_per = int(phone_dur * sr)
    n_total = n_per * len(phone_seq)
    # per-sample formant tracks with linear coarticulation over 30% of
    # each phone boundary
    f1 = np.repeat([PHONES[p][1] * fscale for p in phone_seq], n_per)
    f2 = np.repeat([PHONES[p][2] * fscale for p in phone_seq], n_per)
    k = max(int(0.3 * n_per), 1)
    kernel = np.ones(k) / k
    f1 = np.convolve(f1, kernel, mode="same")
    f2 = np.convolve(f2, kernel, mode="same")
    # glottal-pulse-ish excitation: harmonic stack at f0
    t = np.arange(n_total) / sr
    exc = sum(np.sin(2 * np.pi * pitch * h * t) / h for h in range(1, 4))
    # "formants": amplitude-modulate two resonant carriers by proximity
    # of their instantaneous frequency tracks (cheap source-filter feel)
    ph1 = 2 * np.pi * np.cumsum(f1) / sr
    ph2 = 2 * np.pi * np.cumsum(f2) / sr
    audio = (0.6 * np.sin(ph1) + 0.4 * np.sin(ph2)) * (0.6 + 0.4 * exc / 3)
    # amplitude envelope per phone (attack/decay) to give segmentation cues
    env = np.ones(n_total)
    edge = max(int(0.01 * sr), 1)
    for j in range(len(phone_seq)):
        s = j * n_per
        env[s:s + edge] *= np.linspace(0.3, 1.0, edge)
        env[s + n_per - edge:s + n_per] *= np.linspace(1.0, 0.5, edge)
    audio = audio * env * float(rng.uniform(0.3, 0.6))
    snr_db = float(rng.uniform(12, 30))
    noise = rng.standard_normal(n_total)
    noise *= np.sqrt((audio ** 2).mean() / 10 ** (snr_db / 10))
    return (audio + noise).astype(np.float32)


def _synth_row(task):
    """Worker: synthesize one utterance deterministically from (seed, i).
    Separate from the master rng so corpora can be generated in parallel
    (--workers) at recipe scale (tens of thousands of utterances)."""
    i, sent_words, out_dir, seed, sr = task
    rng = np.random.default_rng((seed, i))
    gap = np.zeros(int(0.04 * sr), np.float32)
    pieces = []
    for w in sent_words:
        pieces.append(_synth_utterance(rng, w, sr))
        pieces.append(gap)
    audio = np.concatenate(pieces[:-1])
    path = os.path.join(out_dir, f"utt{i}.wav")
    write_wav(path, audio, sr)
    return i, len(audio) / sr


def make_hard(args):
    rng = np.random.default_rng(args.seed)
    sr = args.sr
    os.makedirs(args.out_dir, exist_ok=True)
    words, names = _build_lexicon(rng, n_words=args.n_words,
                                  phones_lo=args.phones_lo,
                                  phones_hi=args.phones_hi)
    uni, trans = _bigram_lm(rng, len(words))

    # sample the language sequentially (cheap, one rng stream), then
    # synthesize audio in parallel with per-utterance substreams
    sents = [_sample_sentence(rng, uni, trans, lo=args.sent_lo,
                              hi=args.sent_hi) for _ in range(args.n)]
    tasks = [(i, [words[w] for w in s], args.out_dir, args.seed, sr)
             for i, s in enumerate(sents)]
    durations = [0.0] * args.n
    if args.workers > 1:
        import multiprocessing as mp

        with mp.Pool(args.workers) as pool:
            for i, dur in pool.imap_unordered(_synth_row, tasks,
                                              chunksize=64):
                durations[i] = dur
    else:
        for t in tasks:
            i, dur = _synth_row(t)
            durations[i] = dur

    rows = []
    for i, sent in enumerate(sents):
        text = " ".join(names[w] for w in sent)
        rows.append({"ID": f"utt{i}", "duration": durations[i],
                     "wav": os.path.join(args.out_dir, f"utt{i}.wav"),
                     "spk_id": f"spk{i % 7}", "wrd": text})
    print(f"total audio: {sum(durations) / 3600:.2f} h over {args.n} "
          f"utterances, lexicon {len(words)} words")

    fields = ["ID", "duration", "wav", "spk_id", "wrd"]
    splits = {"train": rows[: int(0.8 * len(rows))],
              "dev": rows[int(0.8 * len(rows)): int(0.9 * len(rows))],
              "test": rows[int(0.9 * len(rows)):]}
    for name, subset in splits.items():
        p = os.path.join(args.out_dir, f"manifest_{name}.csv")
        with open(p, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            w.writeheader()
            w.writerows(subset)
        print(p, len(subset))
    with open(os.path.join(args.out_dir, "manifest.csv"), "w",
              newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    if args.lm_text > 0:
        # text-only LM corpus from the SAME language (the reference's
        # TransformerLM trains on far more text than the paired audio —
        # LibriSpeech's LM corpus; fusion only helps when the LM knows
        # more than the decoder saw)
        p = os.path.join(args.out_dir, "lm_text.txt")
        with open(p, "w") as f:
            for _ in range(args.lm_text):
                sent = _sample_sentence(rng, uni, trans, lo=args.sent_lo,
                                        hi=args.sent_hi)
                f.write(" ".join(names[w] for w in sent) + "\n")
        print(p, args.lm_text)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--lm-text", type=int, default=0,
                    help="--hard only: also write this many TEXT-ONLY "
                         "sentences (lm_text.txt) for LM training")
    ap.add_argument("--hard", action="store_true",
                    help="confusable formant pseudo-language with bigram "
                         "statistics + train/dev/test splits (module doc)")
    ap.add_argument("--n-words", type=int, default=60,
                    help="--hard lexicon size (recipe-scale runs use ~1000 "
                         "so the 5k-piece unigram tokenizer is meaningful)")
    ap.add_argument("--phones-lo", type=int, default=2)
    ap.add_argument("--phones-hi", type=int, default=4)
    ap.add_argument("--sent-lo", type=int, default=3)
    ap.add_argument("--sent-hi", type=int, default=8)
    ap.add_argument("--workers", type=int, default=1,
                    help="parallel synthesis processes for large corpora")
    args = ap.parse_args()

    if args.hard:
        make_hard(args)
        return

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
