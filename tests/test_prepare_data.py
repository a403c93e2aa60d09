"""Corpus preparation (recipes/prepare_data.py): fake corpus trees for
all four datasets -> manifest CSVs consumed by the data pipeline."""

import csv
import os
import sys
import wave

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recipes.prepare_data import (  # noqa: E402
    audio_duration,
    normalize_commonvoice_text,
    prepare_aishell,
    prepare_commonvoice,
    prepare_librispeech,
    prepare_voxpopuli,
)
from summarymixing_tpu.data.dataio import load_wav, read_manifest_csv  # noqa: E402
from summarymixing_tpu.data.flac import encode_flac_file  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _write_flac(path, rng, n=3200, rate=16000):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    x = (rng.standard_normal(n) * 8000).astype(np.int64)
    encode_flac_file(path, x, rate)
    return n / rate


def _write_wav(path, rng, n=3200, rate=16000):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    x = (rng.standard_normal(n) * 8000).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return n / rate


def _read_csv(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def test_librispeech_prepare(tmp_path, rng):
    root = str(tmp_path / "LibriSpeech")
    # two chapters, one with two utterances
    for split, spk, chap, utts in [
        ("train-clean-100", "19", "198", ["0000", "0001"]),
        ("train-clean-100", "26", "495", ["0000"]),
        ("dev-clean", "84", "121123", ["0000"]),
    ]:
        d = os.path.join(root, split, spk, chap)
        lines = []
        for u in utts:
            utt_id = f"{spk}-{chap}-{u}"
            _write_flac(os.path.join(d, utt_id + ".flac"), rng,
                        n=1600 * (1 + int(u)))
            lines.append(f"{utt_id} HELLO WORLD {u}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{spk}-{chap}.trans.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

    out = str(tmp_path / "manifests")
    prepare_librispeech(root, out, ["train-clean-100"], ["dev-clean"])

    train = _read_csv(os.path.join(out, "train.csv"))
    assert len(train) == 3
    assert train[0]["ID"] == "19-198-0000"
    assert train[0]["wrd"] == "HELLO WORLD 0000"
    assert train[0]["spk_id"] == "19"
    assert abs(float(train[0]["duration"]) - 0.1) < 1e-3
    assert abs(float(train[1]["duration"]) - 0.2) < 1e-3

    dev = _read_csv(os.path.join(out, "dev-clean.csv"))
    assert len(dev) == 1

    # the manifest is directly consumable by the data pipeline
    utts = read_manifest_csv(os.path.join(out, "train.csv"))
    audio = load_wav(utts[0].wav_path, 16000)
    assert audio.shape == (1600,) and audio.dtype == np.float32


def test_librispeech_missing_transcript_fails(tmp_path, rng):
    root = str(tmp_path / "LS")
    d = os.path.join(root, "test-clean", "1", "2")
    _write_flac(os.path.join(d, "1-2-0000.flac"), rng)
    with open(os.path.join(d, "1-2.trans.txt"), "w") as f:
        f.write("1-2-9999 SOME OTHER UTT\n")
    with pytest.raises(ValueError, match="no transcript"):
        prepare_librispeech(root, str(tmp_path / "out"), [], ["test-clean"])


def test_aishell_prepare(tmp_path, rng):
    root = str(tmp_path / "aishell")
    os.makedirs(os.path.join(root, "transcript"), exist_ok=True)
    with open(os.path.join(root, "transcript",
                           "aishell_transcript_v0.8.txt"), "w",
              encoding="utf-8") as f:
        f.write("BAC009S0002W0122 你 好 世 界\n")
        f.write("BAC009S0002W0123 语 音 识 别\n")
    for split, utt in [("train", "BAC009S0002W0122"),
                       ("dev", "BAC009S0002W0123"),
                       ("test", "BAC009S0002W0124")]:  # 0124: no transcript
        _write_wav(os.path.join(root, "wav", split, "S0002", utt + ".wav"),
                   rng)
    out = str(tmp_path / "out")
    prepare_aishell(root, out)
    train = _read_csv(os.path.join(out, "train.csv"))
    assert len(train) == 1 and train[0]["wrd"] == "你 好 世 界"
    assert train[0]["spk_id"] == "S0002"
    assert len(_read_csv(os.path.join(out, "test.csv"))) == 0  # skipped


def test_commonvoice_prepare(tmp_path, rng):
    root = str(tmp_path / "cv")
    os.makedirs(os.path.join(root, "clips"), exist_ok=True)
    for split, stem, sent in [("train", "cv1", "Bonjour, le monde!"),
                              ("dev", "cv2", "Ça va?"),
                              ("test", "cv3", "Très bien.")]:
        _write_wav(os.path.join(root, "clips", stem + ".wav"), rng)
        with open(os.path.join(root, f"{split}.tsv"), "w",
                  encoding="utf-8") as f:
            f.write("client_id\tpath\tsentence\n")
            f.write(f"spk_{stem}_0123456789ab\t{stem}.mp3\t{sent}\n")
    out = str(tmp_path / "out")
    prepare_commonvoice(root, out)
    train = _read_csv(os.path.join(out, "train.csv"))
    assert train[0]["wrd"] == "BONJOUR LE MONDE"
    dev = _read_csv(os.path.join(out, "dev.csv"))
    assert dev[0]["wrd"] == "ÇA VA"  # accents kept, punctuation stripped


def test_commonvoice_missing_audio_fails(tmp_path):
    root = str(tmp_path / "cv")
    os.makedirs(os.path.join(root, "clips"), exist_ok=True)
    for split in ("train", "dev", "test"):
        with open(os.path.join(root, f"{split}.tsv"), "w") as f:
            f.write("client_id\tpath\tsentence\n")
            f.write("c\tmissing.mp3\thello\n")
    with pytest.raises(FileNotFoundError, match="no converted"):
        prepare_commonvoice(root, str(tmp_path / "out"))


def test_voxpopuli_prepare(tmp_path, rng):
    root = str(tmp_path / "vp")
    lang = os.path.join(root, "transcribed_data", "en")
    utt = "20180101-0900-PLENARY-1-abc"
    _write_flac(os.path.join(lang, "2018", utt + ".flac"), rng)
    os.makedirs(lang, exist_ok=True)
    for split in ("train", "dev", "test"):
        with open(os.path.join(lang, f"asr_{split}.tsv"), "w",
                  encoding="utf-8") as f:
            f.write("id\traw_text\tnormalized_text\tspeaker_id\n")
            f.write(f"{utt}\tHello there\thello there\tspk9\n")
    out = str(tmp_path / "out")
    prepare_voxpopuli(root, out, "en")
    train = _read_csv(os.path.join(out, "train.csv"))
    assert train[0]["ID"] == utt
    assert train[0]["wrd"] == "HELLO THERE"
    assert train[0]["spk_id"] == "spk9"


def test_audio_duration_header_only(tmp_path, rng):
    wav = str(tmp_path / "a.wav")
    flac = str(tmp_path / "a.flac")
    _write_wav(wav, rng, n=8000)
    _write_flac(flac, rng, n=4000)
    assert abs(audio_duration(wav) - 0.5) < 1e-9
    assert abs(audio_duration(flac) - 0.25) < 1e-9


def test_normalize_commonvoice_text():
    assert normalize_commonvoice_text("It's  fine, really!") == "IT'S FINE REALLY"
    assert normalize_commonvoice_text("a—b", strip_punct=False) == "A—B"
