"""AOT inference export: one portable StableHLO artifact per trained run.

Deployment artifact for the greedy-CTC inference graph — fbank ->
InputNormalization (frozen stats) -> CNN -> encoder -> CTC head ->
greedy collapse markers — serialized with `jax.export`, trained weights
baked in as constants. Loading needs jax but NO model code, recipe
config or checkpoint plumbing, and the shapes are polymorphic (symbolic
batch and a hop-aligned symbolic audio length), so ONE artifact serves
every bucket the server or batch decoder forms.

The reference's deployment story is pickled torch modules fetched by
SpeechBrain's Pretrainer (reference yaml:353-360) — python class code
must ship with the weights. This is the XLA-native equivalent: the
artifact IS the compiled computation.

File format (single file, magic "SMTEXP01"):
  [8 bytes magic][4 bytes LE header length][header JSON][payload]
header = {"meta": {...}, "payload_len": N}; meta carries blank_id,
sample_rate, time_multiple, token_type and the id->piece vocab, so
`ExportedASR.transcribe` is self-contained.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

MAGIC = b"SMTEXP01"


def make_ctc_infer_fn(model, fbank, normalizer, params, norm_stats,
                      blank_id: int = 0) -> Callable:
    """Pure inference fn: (wav [B, N] f32, wav_lens [B] i32) ->
    (ids [B, T'], keep [B, T'] bool, enc_lengths [B]). Mirrors the
    trainer's eval path (training/trainer.py::_eval_step_impl) without
    loss computation or batch dict plumbing."""
    from summarymixing_tpu.decoding.ctc import ctc_greedy_decode

    def infer(wav, wav_lens):
        feats = fbank(wav)
        feat_lens = fbank.frame_lengths(wav_lens)
        feats, _ = normalizer(feats, norm_stats)
        out = model.apply({"params": params}, feats, feat_lens)
        ids, keep = ctc_greedy_decode(
            out["ctc_log_probs"], out["enc_lengths"], blank_id)
        return ids, keep, out["enc_lengths"]

    return infer


def make_transducer_infer_fn(enc_model, td_model, fbank, normalizer,
                             params, norm_stats,
                             blank_id: int = 0) -> Callable:
    """Pure transducer inference: (wav [B, N], wav_lens [B]) ->
    (tokens [B, Umax], token_lens [B], enc_lengths [B]) with the batched
    greedy decode scan inside the graph (the transducer recipes' valid
    decode, reference transducer yaml:375-379 greedy searcher)."""
    from summarymixing_tpu.decoding.transducer_search import (
        transducer_greedy_decode,
    )

    bound = td_model.bind({"params": params["transducer"]})

    def infer(wav, wav_lens):
        feats = fbank(wav)
        feat_lens = fbank.frame_lengths(wav_lens)
        feats, _ = normalizer(feats, norm_stats)
        enc_out, enc_lens = enc_model.apply(
            {"params": params["encoder"]}, feats, feat_lens,
            method=enc_model.encode)
        toks, lens = transducer_greedy_decode(
            bound.encode_proj(enc_out), enc_lens,
            bound.predictor_init, bound.predictor_step, bound.joint_step,
            blank_id=blank_id)
        return toks, lens, enc_lens

    return infer


def export_ctc_infer(infer_fn: Callable, *, time_multiple: int = 320,
                     fixed_shape: Optional[Sequence[int]] = None) -> bytes:
    """Serialize the inference fn via jax.export.

    Polymorphic by default: batch is fully symbolic; the sample axis is
    `time_multiple * n` (hop-aligned so the frame-count arithmetic stays
    resolvable — callers pad to this grid anyway, serving.py/transcribe
    both use coarser quanta). `fixed_shape=(B, N)` exports one static
    shape instead (e.g. for runtimes that reject dynamic dims)."""
    from jax import export as jexport

    if fixed_shape is not None:
        b_dim, n_dim = fixed_shape
        wav_spec = jax.ShapeDtypeStruct((b_dim, n_dim), jnp.float32)
        len_spec = jax.ShapeDtypeStruct((b_dim,), jnp.int32)
    else:
        b, n = jexport.symbolic_shape(f"b, {time_multiple}*n")
        wav_spec = jax.ShapeDtypeStruct((b, n), jnp.float32)
        len_spec = jax.ShapeDtypeStruct((b,), jnp.int32)
    exported = jexport.export(jax.jit(infer_fn))(wav_spec, len_spec)
    return exported.serialize()


def pack_artifact(payload, meta: Dict) -> bytes:
    """payload: bytes (single exported fn) or {name: bytes} (multi-fn
    artifact, e.g. streaming init+step). Multi payloads are recorded as
    an ordered [name, length] list in the header and concatenated."""
    if isinstance(payload, dict):
        names = list(payload.keys())
        header = json.dumps({
            "meta": meta,
            "payloads": [[n, len(payload[n])] for n in names],
        }).encode()
        body = b"".join(payload[n] for n in names)
    else:
        header = json.dumps(
            {"meta": meta, "payload_len": len(payload)}).encode()
        body = payload
    return MAGIC + struct.pack("<I", len(header)) + header + body


def unpack_artifact(data: bytes):
    """Returns (meta, payload bytes) for single-fn artifacts and
    (meta, {name: bytes}) for multi-fn ones."""
    if data[:8] != MAGIC:
        raise ValueError("not a summarymixing_tpu export artifact")
    (hlen,) = struct.unpack("<I", data[8:12])
    header = json.loads(data[12:12 + hlen].decode())
    body = data[12 + hlen:]
    if "payloads" in header:
        out, off = {}, 0
        for name, ln in header["payloads"]:
            out[name] = body[off:off + ln]
            off += ln
        return header["meta"], out
    return header["meta"], body[: header["payload_len"]]


def decode_token_rows(meta: Dict, rows: List[List[int]]) -> List[str]:
    """Token ids -> text using the vocab/token_type embedded in an
    artifact's metadata (single decode path for every Exported* class)."""
    vocab = meta.get("vocab")
    out = []
    for toks in rows:
        if vocab is None:
            out.append(" ".join(map(str, toks)))
        elif meta.get("token_type") == "char":
            out.append("".join(vocab[t] for t in toks
                               if 0 <= t < len(vocab)))
        else:  # subword pieces with the sentencepiece space marker
            text = "".join(vocab[t] for t in toks if 0 <= t < len(vocab))
            out.append(text.replace("▁", " ").strip())
    return out


@dataclass
class ExportedASR:
    """A loaded artifact: callable + enough metadata to produce text."""

    meta: Dict
    _call: Callable

    @classmethod
    def load(cls, path: str) -> "ExportedASR":
        from jax import export as jexport

        with open(path, "rb") as f:
            meta, payload = unpack_artifact(f.read())
        exported = jexport.deserialize(bytearray(payload))
        return cls(meta=meta, _call=exported.call)

    def __call__(self, wav: np.ndarray, wav_lens: np.ndarray):
        return self._call(jnp.asarray(wav, jnp.float32),
                          jnp.asarray(wav_lens, jnp.int32))

    def _pad(self, wav: np.ndarray) -> np.ndarray:
        m = int(self.meta.get("time_multiple", 320))
        n = wav.shape[-1]
        pad = (-n) % m
        if pad:
            wav = np.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, pad)])
        return wav

    def transcribe(self, wav: np.ndarray) -> List[str]:
        """wav [B, N] or [N] float32 -> decoded text per utterance, using
        the vocab embedded in the artifact."""
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        lens = np.full((wav.shape[0],), wav.shape[1], np.int32)
        if self.meta.get("family") == "transducer":
            toks_arr, tok_lens, _ = self(self._pad(wav), lens)
            toks_arr, tok_lens = np.asarray(toks_arr), np.asarray(tok_lens)
            rows = [[int(t) for t in toks_arr[i, : tok_lens[i]]]
                    for i in range(len(toks_arr))]
        else:
            ids, keep, _ = self(self._pad(wav), lens)
            ids, keep = np.asarray(ids), np.asarray(keep)
            rows = [[int(i) for i in row_ids[row_keep.astype(bool)]]
                    for row_ids, row_keep in zip(ids, keep)]
        return decode_token_rows(self.meta, rows)


def save_artifact(path: str, payload, meta: Dict) -> None:
    with open(path, "wb") as f:
        f.write(pack_artifact(payload, meta))


def export_streaming(init_fn: Callable, step_fn: Callable,
                     chunk_samples: int,
                     fixed_batch: Optional[int] = None) -> Dict[str, bytes]:
    """Serialize a streaming (init, step) pair (streaming.py::
    make_streaming_infer_fns) as two jax.export payloads sharing one
    symbolic batch dim. The step's carry spec is derived by shape-tracing
    init, so the two functions stay structurally consistent by
    construction."""
    from jax import export as jexport

    if fixed_batch is not None:
        b = fixed_batch
    else:
        (b,) = jexport.symbolic_shape("b")
    ref_spec = jax.ShapeDtypeStruct((b,), jnp.int32)
    carry_spec = jax.eval_shape(init_fn, ref_spec)
    wav_spec = jax.ShapeDtypeStruct((b, chunk_samples), jnp.float32)
    nv_spec = jax.ShapeDtypeStruct((b,), jnp.int32)
    init_exp = jexport.export(jax.jit(init_fn))(ref_spec)
    step_exp = jexport.export(jax.jit(step_fn))(carry_spec, wav_spec,
                                                nv_spec)
    return {"init": init_exp.serialize(), "step": step_exp.serialize()}


@dataclass
class ExportedStreamingASR:
    """A loaded streaming artifact: explicit init/step for real streaming
    callers, plus batch `transcribe` built on the same step fn.

    The step consumes `meta["chunk_samples"]` raw samples per call and
    emits the tokens decoded for the PREVIOUS chunk (one-chunk lag for
    frontend lookahead — streaming.py module doc); the caller feeds one
    final zero chunk to flush."""

    meta: Dict
    _init: Callable
    _step: Callable

    @classmethod
    def load(cls, path: str) -> "ExportedStreamingASR":
        from jax import export as jexport

        with open(path, "rb") as f:
            meta, payloads = unpack_artifact(f.read())
        if not isinstance(payloads, dict) or "step" not in payloads:
            raise ValueError("not a streaming artifact (single payload)")
        init = jexport.deserialize(bytearray(payloads["init"])).call
        step = jexport.deserialize(bytearray(payloads["step"])).call
        return cls(meta=meta, _init=init, _step=step)

    def init(self, batch: int):
        return self._init(jnp.zeros((batch,), jnp.int32))

    def step(self, carry, wav_chunk, n_valid):
        return self._step(carry, jnp.asarray(wav_chunk, jnp.float32),
                          jnp.asarray(n_valid, jnp.int32))

    def transcribe(self, wav: np.ndarray,
                   wav_lens: Optional[np.ndarray] = None) -> List[str]:
        """Batch convenience: stream [B, N] (or [N]) audio through the
        exported step via streaming.run_stream (the ONE chunk-drive loop
        — padding and flush-chunk geometry live there, not re-implemented
        here), return text per utterance. `wav_lens` marks per-row valid
        samples for ragged batches (default: all N)."""
        from summarymixing_tpu import streaming as _streaming

        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        b, n = wav.shape
        lens = (np.full((b,), n, np.int32) if wav_lens is None
                else np.asarray(wav_lens, np.int32))
        # jit=False: the exported init/step are already compiled calls
        toks, tok_lens = _streaming.run_stream(
            self._init, self._step, wav, lens,
            int(self.meta["chunk_samples"]), jit=False)
        toks, tok_lens = np.asarray(toks), np.asarray(tok_lens)
        rows = [[int(t) for t in toks[i, : tok_lens[i]]] for i in range(b)]
        return decode_token_rows(self.meta, rows)
