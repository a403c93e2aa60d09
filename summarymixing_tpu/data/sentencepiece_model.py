"""Pure-python reader for SentencePiece ``.model`` files (ModelProto).

Capability parity: the reference's Pretrainer fetches a published
tokenizer (a sentencepiece ``.model`` protobuf) alongside the LM
(reference branchformer_summarymixing.yaml:349-360, ``token_type:
unigram`` at :193). The sentencepiece wheel is not installed in this
image, but the model file is a plain protobuf of pieces + scores: this
module decodes the wire format directly and provides Viterbi
encoding/decoding with sentencepiece's own id layout (file order), so
published tokenizers load with **no native dependency**.

Wire format (protobuf), from the public sentencepiece_model.proto:

    ModelProto:     repeated SentencePiece pieces = 1;
                    TrainerSpec trainer_spec = 2;      (skipped)
                    NormalizerSpec normalizer_spec = 3 (skipped)
    SentencePiece:  string piece = 1; float score = 2; Type type = 3
    Type enum:      NORMAL=1 UNKNOWN=2 CONTROL=3 USER_DEFINED=4
                    UNUSED=5 BYTE=6

Encoding reproduces sentencepiece's unigram Viterbi under the defaults
the ASR recipes train with (``add_dummy_prefix`` + ``split_by_whitespace``:
whitespace-split words, each prefixed with U+2581): best-scoring
segmentation per word; characters outside the vocabulary fall back to
BYTE pieces when the model has them (``byte_fallback``) and to the UNK
piece otherwise, scored ``min_score - 10`` (sentencepiece's unknown
penalty). Exact normalisation (NFKC rule tables in NormalizerSpec) is
not re-implemented — ASR transcripts are plain-ASCII upper/lower text
for which NMT-NFKC is the identity.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

_WORD_MARK = "▁"  # ▁

NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6


# ------------------------------------------------------------------ wire --


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise ValueError("malformed varint")


def _skip_field(wire: int, buf: bytes, pos: int) -> int:
    if wire == 0:                      # varint
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == 1:                      # 64-bit
        return pos + 8
    if wire == 2:                      # length-delimited
        n, pos = _read_varint(buf, pos)
        return pos + n
    if wire == 5:                      # 32-bit
        return pos + 4
    raise ValueError(f"unsupported protobuf wire type {wire}")


def _parse_sentence_piece(buf: bytes) -> Tuple[str, float, int]:
    piece, score, ptype = "", 0.0, NORMAL
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:       # piece
            n, pos = _read_varint(buf, pos)
            piece = buf[pos:pos + n].decode("utf-8")
            pos += n
        elif field == 2 and wire == 5:     # score (float32)
            score = struct.unpack("<f", buf[pos:pos + 4])[0]
            pos += 4
        elif field == 3 and wire == 0:     # type
            ptype, pos = _read_varint(buf, pos)
        else:
            pos = _skip_field(wire, buf, pos)
    return piece, score, ptype


def parse_model_proto(data: bytes) -> List[Tuple[str, float, int]]:
    """Decode a serialized ModelProto into [(piece, score, type)] in file
    order — file order IS the sentencepiece id layout."""
    pieces: List[Tuple[str, float, int]] = []
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:       # repeated SentencePiece
            n, pos = _read_varint(data, pos)
            pieces.append(_parse_sentence_piece(data[pos:pos + n]))
            pos += n
        else:
            pos = _skip_field(wire, data, pos)
    if not pieces:
        raise ValueError("no pieces found: not a sentencepiece ModelProto?")
    return pieces


# ------------------------------------------------------------- tokenizer --


@dataclass(frozen=True)
class _Piece:
    piece: str
    score: float
    type: int


class SentencePieceModel:
    """Viterbi encoder/decoder over a parsed ModelProto, id-compatible
    with the sentencepiece runtime (ids = piece file order)."""

    def __init__(self, pieces: Sequence[Tuple[str, float, int]]):
        self.pieces = [_Piece(*p) for p in pieces]
        self._scores: Dict[str, float] = {}
        self._id_of: Dict[str, int] = {}
        self._byte_of: Dict[int, int] = {}   # byte value -> piece id
        self.unk_id = 0
        self.bos_id = self.eos_id = -1
        controls = []
        for i, p in enumerate(self.pieces):
            if p.type in (NORMAL, USER_DEFINED):
                # first occurrence wins on duplicates (sentencepiece
                # forbids them anyway)
                self._scores.setdefault(p.piece, p.score)
                self._id_of.setdefault(p.piece, i)
            elif p.type == UNKNOWN:
                self.unk_id = i
            elif p.type == CONTROL:
                controls.append((p.piece, i))
            elif p.type == BYTE:
                # "<0xNN>"
                self._byte_of[int(p.piece[1:-1], 16)] = i
        for name, i in controls:
            if name in ("<s>", "<bos>"):
                self.bos_id = i
            elif name in ("</s>", "<eos>"):
                self.eos_id = i
        self.max_piece_len = max(
            (len(p) for p in self._scores), default=1)
        self._min_score = min(
            (s for s in self._scores.values()), default=0.0)
        self._unk_score = self._min_score - 10.0   # kUnkPenalty

    # -- construction ------------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "SentencePieceModel":
        with open(path, "rb") as f:
            return cls(parse_model_proto(f.read()))

    @property
    def vocab_size(self) -> int:
        return len(self.pieces)

    # -- encode ------------------------------------------------------------
    def _encode_word(self, word: str) -> List[int]:
        """Best-scoring segmentation (Viterbi over piece scores); unknown
        characters become byte pieces (byte_fallback models) or UNK."""
        n = len(word)
        neg = -1e30
        best = [neg] * (n + 1)
        back: List[Tuple[int, int] | None] = [None] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(0, i - self.max_piece_len), i):
                sub = word[j:i]
                s = self._scores.get(sub)
                if s is None:
                    if i - j > 1:
                        continue
                    s = self._unk_score          # single unknown char
                    pid = -1
                else:
                    pid = self._id_of[sub]
                v = best[j] + s
                if v > best[i]:
                    best[i] = v
                    back[i] = (j, pid)
        ids: List[int] = []
        i = n
        while i > 0:
            j, pid = back[i]
            if pid >= 0:
                ids.append(pid)
            elif self._byte_of:
                ids.extend(self._byte_of.get(b, self.unk_id)
                           for b in reversed(word[j:i].encode("utf-8")))
            else:
                ids.append(self.unk_id)
            i = j
        return ids[::-1]

    def encode(self, text: str) -> List[int]:
        out: List[int] = []
        for w in text.split():
            out.extend(self._encode_word(_WORD_MARK + w))
        return out

    # -- decode ------------------------------------------------------------
    def decode(self, ids: Sequence[int]) -> str:
        chunks: List[str] = []
        byte_buf = bytearray()
        for i in ids:
            i = int(i)
            if not 0 <= i < len(self.pieces):
                continue
            p = self.pieces[i]
            if p.type == BYTE:
                byte_buf.append(int(p.piece[1:-1], 16))
                continue
            if byte_buf:
                chunks.append(byte_buf.decode("utf-8", errors="replace"))
                byte_buf.clear()
            if p.type in (NORMAL, USER_DEFINED):
                chunks.append(p.piece)
            elif p.type == UNKNOWN:
                chunks.append(" ⁇ ")        # sentencepiece unk_surface
        if byte_buf:
            chunks.append(byte_buf.decode("utf-8", errors="replace"))
        return "".join(chunks).replace(_WORD_MARK, " ").strip()


# ------------------------------------------------------------ serializer --


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def serialize_model_proto(pieces: Sequence[Tuple[str, float, int]]) -> bytes:
    """Inverse of parse_model_proto (round-trip tests; also lets the
    in-repo subword trainer EXPORT a wheel-compatible .model file)."""
    out = bytearray()
    for piece, score, ptype in pieces:
        body = bytearray()
        raw = piece.encode("utf-8")
        body += _varint((1 << 3) | 2) + _varint(len(raw)) + raw
        body += _varint((2 << 3) | 5) + struct.pack("<f", score)
        body += _varint((3 << 3) | 0) + _varint(ptype)
        out += _varint((1 << 3) | 2) + _varint(len(body)) + bytes(body)
    return bytes(out)
