"""Self-contained streaming inference: raw audio chunks in, tokens out.

The reference's streaming contract starts at the encoder
(TransformerASR.py:562-653 encode_streaming takes CNN-frontend output;
the feature frontend is streamed by SpeechBrain core machinery outside
the overlay). A deployable streaming system needs the WHOLE pipeline
chunked — fbank, InputNormalization, CNN subsampling, conformer layers,
and the transducer's incremental greedy decode — with every piece of
cross-chunk state an explicit carry. This module provides exactly that
as two pure, jit/export-able functions:

    init(batch_ref)            -> carry
    step(carry, wav, n_valid)  -> (carry', new_tokens, n_new)

`wav` is the next `chunk_samples` raw samples of every stream in the
batch; `n_valid` marks how many of them are real (streams are
front-aligned, so validity is monotone). The step emits the tokens the
transducer produced for ONE encoder chunk.

Exactness. The offline pipeline computes fbank + CNN over the whole
utterance; chunked recomputation reproduces it bit-for-bit via the
receptive-field window (derivation, for the recipe frontend — fbank
win 512 / hop 160 centered, CNN 2 blocks kernel 3 stride 2 => sub = 4):

- encoder frames [a, b) need CNN-input (fbank) frames [4a-3, 4b+1); one
  encoder frame (e = 1) of extension each side makes the CNN's own
  zero-padding artifacts fall outside the slice, so the chunked CNN runs
  on fbank frames [4(a-1), 4(b+1)) and keeps outputs [1, 1+C).
- fbank frame g covers samples [g*hop - win/2, g*hop + win/2), so the
  sample window is [s0 - lead, s0 + chunk + look) with
  lead = (sub*e + ceil(half/hop)) * hop (hop-aligned) and
  look = (sub*e - 1) * hop + half  (= 960 / 736 for the recipe frontend).
- processing therefore lags input by ONE chunk (the lookahead must have
  arrived): step k processes encoder chunk k-1. The rolling sample
  buffer holds the last 2*chunk + lead samples; the first call only
  primes it (gated with lax.cond).
- fbank frames before the stream start are computed from buffer zeros,
  which is NOT what the offline CNN sees (it zero-pads in the FEATURE
  domain); they are re-zeroed by global frame index, post-normalization.

One documented approximation: the fbank's top_db clamp references the
per-utterance max (features.py::Fbank.__call__); a stream cannot know a
future max, so the carry tracks the running max (exact whenever the
peak is in or before the processed window; silence/padding frames sit
80 dB down either way).

The decode carry is the transducer predictor state + last dec_proj —
`transducer_greedy_decode`'s documented streaming carry with a
per-chunk token buffer, so emissions are per-chunk and the stream can
run forever (no whole-stream buffer).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from summarymixing_tpu.decoding.transducer_search import (
    transducer_greedy_decode,
)
from summarymixing_tpu.models.asr import ASRStreamingState, DynChunkTrainConfig
from summarymixing_tpu.models.conformer import (
    ConformerLayerStreamingState,
    ConformerStreamingState,
)

Array = jax.Array


@dataclass(frozen=True)
class StreamGeometry:
    """Static sample/frame arithmetic for a chunked frontend."""

    chunk_frames: int          # encoder frames per chunk (C)
    hop: int                   # fbank hop, samples
    win: int                   # fbank window, samples
    sub: int                   # frontend time subsampling (prod of strides)
    ext: int = 1               # encoder-frame extension each side (e)

    @property
    def chunk_samples(self) -> int:
        return self.chunk_frames * self.sub * self.hop

    @property
    def lead(self) -> int:
        half = self.win // 2
        return (self.sub * self.ext + math.ceil(half / self.hop)) * self.hop

    @property
    def lookahead(self) -> int:
        return (self.sub * self.ext - 1) * self.hop + self.win // 2

    @property
    def buf_len(self) -> int:
        return 2 * self.chunk_samples + self.lead

    @property
    def window_len(self) -> int:
        return self.chunk_samples + self.lead + self.lookahead

    @property
    def n_fbank_frames(self) -> int:
        return self.sub * (self.chunk_frames + 2 * self.ext)

    @property
    def first_window_frame(self) -> int:
        # window-local index of extended fbank frame i=0 (see module doc)
        return self.lead // self.hop - self.sub * self.ext


def _check_frontend(model) -> None:
    strides = tuple(model.frontend_strides)
    if strides != (2, 2):
        raise ValueError(
            f"streaming frontend supports the recipe CNN (strides (2, 2), "
            f"kernel 3); got strides {strides}")


def _asr_state_to_plain(st: ASRStreamingState) -> dict:
    return {
        "frame_offset": st.frame_offset,
        "layers": [
            {"mha_left": l.mha_left, "conv_left": l.conv_left,
             "frames_seen": l.frames_seen}
            for l in st.encoder.layers
        ],
    }


def _asr_state_from_plain(d: dict, chunk_size: int) -> ASRStreamingState:
    layers = tuple(
        ConformerLayerStreamingState(
            mha_left=l["mha_left"], conv_left=l["conv_left"],
            frames_seen=l["frames_seen"])
        for l in d["layers"]
    )
    return ASRStreamingState(
        encoder=ConformerStreamingState(layers=layers),
        frame_offset=d["frame_offset"], chunk_size=chunk_size,
    )


def streamed_frontend_chunk(
    fbank,
    normalizer,
    norm_stats,
    cnn_apply: Callable[[Array], Array],
    geom: StreamGeometry,
    window: Array,
    chunk_index: Array,
    db_max: Array,
) -> Tuple[Array, Array]:
    """Recompute the offline fbank+normalize+CNN for encoder chunk
    `chunk_index` from its raw-sample window (see module doc for the
    window geometry). Returns (cnn_chunk [B, C, F'], db_max').

    `window` covers samples [s0 - lead, s0 + chunk + lookahead) of the
    stream, s0 = chunk_index * chunk_samples; `chunk_index` is [B] (rows
    are independent streams that may be at different positions); `db_max`
    is the running per-row max of the UNCLAMPED log-mel (the top_db
    reference)."""
    from summarymixing_tpu.frontend.features import (
        mel_filterbank,
        stft_magnitude,
    )

    spec = stft_magnitude(window, fbank.n_fft, fbank.win_length,
                          fbank.hop_length, fbank.power)
    j0 = geom.first_window_frame
    spec = spec[:, j0: j0 + geom.n_fbank_frames]
    fb = jnp.asarray(mel_filterbank(fbank.n_mels, fbank.n_fft,
                                    fbank.sample_rate, fbank.f_min,
                                    fbank.f_max))
    mel = jnp.einsum("btf,fm->btm", spec, fb,
                     preferred_element_type=jnp.float32)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db_max = jnp.maximum(db_max, jnp.max(db, axis=(1, 2)))
    feats = jnp.maximum(
        db, (db_max - fbank.top_db)[:, None, None])
    feats, _ = normalizer(feats, norm_stats)
    # frames before the stream start: the offline CNN zero-pads in the
    # feature domain at EVERY layer; input_frame_offset reproduces that
    # per row (ops/convolution.py::ConvolutionFrontEnd)
    g0 = geom.sub * (jnp.asarray(chunk_index).reshape(-1)
                     * geom.chunk_frames - geom.ext)
    cnn_out = cnn_apply(feats, g0)  # [B, C + 2*ext, F']
    return cnn_out[:, geom.ext: geom.ext + geom.chunk_frames], db_max


def make_streaming_infer_fns(
    enc_model,
    td_model,
    fbank,
    normalizer,
    params,
    norm_stats,
    *,
    chunk_frames: int = 16,
    left_context_chunks: int = 4,
    blank_id: int = 0,
    max_symbols_per_frame: int = 3,
):
    """Build (init_fn, step_fn, info) for a trained transducer run.

    init_fn(batch_ref [b] any-dtype) -> carry (plain pytree of arrays)
    step_fn(carry, wav [b, chunk_samples] f32, n_valid [b] i32)
        -> (carry', tokens [b, C*max_symbols] i32, n_new [b] i32)

    Both close over the weights, so they can be jitted directly or
    serialized with jax.export (utils/export.py::export_streaming).
    """
    _check_frontend(enc_model)
    geom = StreamGeometry(
        chunk_frames=chunk_frames, hop=fbank.hop_length,
        win=fbank.win_length, sub=4,
    )
    if geom.chunk_samples < geom.lookahead:
        raise ValueError(
            f"chunk_frames {chunk_frames} too small: the {geom.lookahead}"
            f"-sample lookahead must fit in one {geom.chunk_samples}-sample "
            "chunk (need chunk_frames >= 2 for the recipe frontend)")
    eparams = {"params": params["encoder"]}
    bound = td_model.bind({"params": params["transducer"]})
    dynchunk = DynChunkTrainConfig(chunk_size=chunk_frames,
                                   left_context_size=left_context_chunks)
    umax = chunk_frames * max_symbols_per_frame

    def cnn_apply(feats, input_frame_offset):
        return enc_model.apply(eparams, feats, input_frame_offset,
                               method=enc_model.frontend)

    def init_fn(batch_ref: Array) -> dict:
        b = batch_ref.shape[0]
        asr_state = enc_model.apply(
            eparams, b, dynchunk, method=enc_model.streaming_init)
        pred_state = bound.predictor_init(b)
        pred_state, dec_proj = bound.predictor_step(
            pred_state, jnp.full((b,), blank_id, jnp.int32))
        return {
            "buf": jnp.zeros((b, geom.buf_len), jnp.float32),
            "db_max": jnp.full((b,), -jnp.inf, jnp.float32),
            "valid_samples": jnp.zeros((b,), jnp.int32),
            "chunks": jnp.zeros((b,), jnp.int32),
            "enc": _asr_state_to_plain(asr_state),
            "pred": pred_state,
            "dec_proj": dec_proj,
        }

    def step_fn(carry: dict, wav: Array, n_valid: Array):
        if wav.shape[-1] != geom.chunk_samples:
            raise ValueError(
                f"step expects {geom.chunk_samples} samples per chunk "
                f"({chunk_frames} encoder frames), got {wav.shape[-1]}")
        buf = jnp.concatenate(
            [carry["buf"][:, geom.chunk_samples:], wav], axis=1)
        valid_samples = carry["valid_samples"] + jnp.minimum(
            n_valid.astype(jnp.int32), geom.chunk_samples)
        p = carry["chunks"] - 1  # [B] processed (lagged) chunk index
        b = wav.shape[0]

        window = buf[:, : geom.window_len]
        cnn_chunk, db_max = streamed_frontend_chunk(
            fbank, normalizer, norm_stats, cnn_apply, geom, window,
            p, carry["db_max"])
        asr_state = _asr_state_from_plain(carry["enc"], chunk_frames)
        enc_chunk, asr_state = enc_model.apply(
            eparams, cnn_chunk, asr_state,
            method=enc_model.encode_streaming_chunk)
        enc_total = enc_model.apply(
            eparams, fbank.frame_lengths(valid_samples),
            method=enc_model.subsampled_length)
        chunk_valid = jnp.clip(enc_total - p * chunk_frames, 0,
                               chunk_frames)
        dec_carry = (carry["pred"], carry["dec_proj"],
                     jnp.zeros((b, umax), jnp.int32),
                     jnp.zeros((b,), jnp.int32))
        tokens, n_new, (pred, dec_proj, _, _) = transducer_greedy_decode(
            bound.encode_proj(enc_chunk), chunk_valid,
            bound.predictor_init, bound.predictor_step, bound.joint_step,
            blank_id=blank_id,
            max_symbols_per_frame=max_symbols_per_frame,
            carry=dec_carry, return_carry=True)

        # rows on their FIRST call only prime the buffer: chunk -1 does
        # not exist, so keep the old state and emit nothing (per-row
        # select — rows are independent streams)
        active = carry["chunks"] > 0  # [B]

        def sel(new, old):
            m = active.reshape((b,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        new_enc = jax.tree.map(sel, _asr_state_to_plain(asr_state),
                               carry["enc"])
        new_carry = {
            "buf": buf,
            "db_max": sel(db_max, carry["db_max"]),
            "valid_samples": valid_samples,
            "chunks": carry["chunks"] + 1,
            "enc": new_enc,
            "pred": jax.tree.map(sel, pred, carry["pred"]),
            "dec_proj": sel(dec_proj, carry["dec_proj"]),
        }
        tokens = jnp.where(active[:, None], tokens, 0)
        n_new = jnp.where(active, n_new, 0)
        return new_carry, tokens, n_new

    info = {
        "chunk_samples": geom.chunk_samples,
        "chunk_frames": chunk_frames,
        "left_context_chunks": left_context_chunks,
        "lookahead_samples": geom.lookahead,
        "max_new_tokens": umax,
        "blank_id": blank_id,
    }
    return init_fn, step_fn, info


_JIT_CACHE = None  # OrderedDict[id(fn)] = (fn, jit(fn)); populated lazily
_JIT_CACHE_MAX = 16


def _jit_cached(fn: Callable) -> Callable:
    """jax.jit keyed by the function object, in a small LRU: repeated
    run_stream calls over the same fns (e.g. per eval batch) reuse one
    traced wrapper instead of retracing every call, while distinct fns
    (e.g. a per-checkpoint eval sweep) evict old entries instead of
    pinning every model's executables and closed-over weights for the
    process lifetime. (A WeakKeyDictionary cannot work here: the jit
    wrapper value strongly references its wrapped fn key, so entries
    would never be collected.) Each entry holds a strong ref to fn, so
    an id() key cannot be reused while its entry is alive."""
    global _JIT_CACHE
    from collections import OrderedDict

    if _JIT_CACHE is None:
        _JIT_CACHE = OrderedDict()
    key = id(fn)
    got = _JIT_CACHE.get(key)
    if got is not None and got[0] is fn:
        _JIT_CACHE.move_to_end(key)
        return got[1]
    wrapper = jax.jit(fn)
    _JIT_CACHE[key] = (fn, wrapper)
    while len(_JIT_CACHE) > _JIT_CACHE_MAX:
        _JIT_CACHE.popitem(last=False)
    return wrapper


def run_stream(
    init_fn: Callable,
    step_fn: Callable,
    wav,
    wav_lens,
    chunk_samples: int,
    jit: bool = True,
):
    """Drive a whole [B, N] batch through the chunked pipeline (pads the
    tail and feeds one extra flush chunk so the lagged last chunk is
    processed). Returns (tokens [B, U], lens [B]) accumulated across
    chunks — the reference-shaped decode output. Host-side convenience
    for tests/CLI; real streaming callers hold the carry themselves."""
    import numpy as np

    wav = jnp.asarray(wav, jnp.float32)
    wav_lens = jnp.asarray(wav_lens, jnp.int32)
    b, n = wav.shape
    n_chunks = -(-n // chunk_samples)
    pad = n_chunks * chunk_samples - n
    if pad:
        wav = jnp.pad(wav, ((0, 0), (0, pad)))
    step = _jit_cached(step_fn) if jit else step_fn
    carry = (_jit_cached(init_fn) if jit else init_fn)(
        jnp.zeros((b,), jnp.int32))
    chunks_toks, chunks_n = [], []
    # TWO flush chunks: one for the one-chunk pipeline lag, one because
    # frame_lengths = 1 + n//hop puts one encoder frame past the last
    # input chunk when a row's valid length is an exact chunk multiple
    # (that chunk decodes with chunk_valid = 1; otherwise it is a no-op)
    for k in range(n_chunks + 2):
        if k < n_chunks:
            chunk = wav[:, k * chunk_samples: (k + 1) * chunk_samples]
            nv = jnp.clip(wav_lens - k * chunk_samples, 0, chunk_samples)
        else:
            chunk = jnp.zeros((b, chunk_samples), jnp.float32)
            nv = jnp.zeros((b,), jnp.int32)
        carry, toks, n_new = step(carry, chunk, nv)
        chunks_toks.append(np.asarray(toks))
        chunks_n.append(np.asarray(n_new))
    lens = np.sum(np.stack(chunks_n), axis=0).astype(np.int32)
    final = np.zeros((b, max(int(lens.max()), 1)), np.int32)
    for i in range(b):
        pos = 0
        for toks, n_new in zip(chunks_toks, chunks_n):
            c = int(n_new[i])
            final[i, pos: pos + c] = toks[i, :c]
            pos += c
    return jnp.asarray(final), jnp.asarray(lens)
