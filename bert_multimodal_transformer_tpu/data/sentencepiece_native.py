"""Pure-Python SentencePiece unigram inference (zero dependencies).

The reference's XLNet path tokenizes with HF ``XLNetTokenizer``, which wraps
the SentencePiece C++ library over ``spiece.model``
(multimodal_driver.py:208-218). Neither the wheel nor a model file ships in
this image, so this module implements the inference half natively:

  * a protobuf wire-format reader for ``ModelProto`` (pieces + scores +
    types) — no protoc/protobuf dependency, just varint/length-delimited
    scanning of the serialized file;
  * Viterbi segmentation over the unigram log-probabilities (the exact
    algorithm SentencePiece uses at encode time for model_type=unigram),
    with the standard character-level <unk> fallback
    (score = min_score − 10) and consecutive-unknown merging;
  * ``PurePythonSentencePiece`` mirroring the subset of the
    ``sentencepiece.SentencePieceProcessor`` API the tokenizer layer uses
    (EncodeAsPieces / PieceToId / IdToPiece / GetPieceSize / unk_id), so
    ``SentencePieceTokenizer`` works with a real ``spiece.model`` and no
    extra packages.

Normalization: SentencePiece's full "nmt_nfkc" normalizer applies a
precompiled character map; this implementation approximates it with NFKC +
control-character removal + whitespace collapsing, which agrees on the
ASCII/latin text MOSI/MOSEI transcripts contain. The approximation is
documented here rather than hidden.
"""

from __future__ import annotations

import struct
import unicodedata
from typing import Dict, List, Tuple

SPIECE_UNDERLINE = "▁"  # ▁

# sentencepiece.proto ModelProto.SentencePiece.Type values
TYPE_NORMAL = 1
TYPE_UNKNOWN = 2
TYPE_CONTROL = 3
TYPE_USER_DEFINED = 4
TYPE_UNUSED = 5
TYPE_BYTE = 6

_UNK_PENALTY = 10.0  # kUnkPenalty in sentencepiece's unigram model


# --------------------------------------------------------------------------
# protobuf wire-format scanning
# --------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            # keep the fail-loudly contract: a file cut mid-varint must
            # raise the same ValueError class as other truncations
            raise ValueError("truncated message: varint runs past the end")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _scan_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a serialized message.
    value is int for varint/fixed, bytes for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        if pos > n:
            # a truncated file (interrupted copy) must fail loudly, not
            # load as a smaller vocabulary (the real sentencepiece lib
            # rejects such files too)
            raise ValueError(
                f"truncated message: field {field} extends past the "
                f"buffer ({pos} > {n})")
        yield field, wire, val


def parse_model_proto(data: bytes) -> List[Tuple[str, float, int]]:
    """ModelProto → [(piece, score, type)], in id order.

    ModelProto field 1 = repeated SentencePiece {piece=1 (string),
    score=2 (float), type=3 (enum, default NORMAL)}.
    """
    pieces: List[Tuple[str, float, int]] = []
    for field, wire, val in _scan_fields(data):
        if field == 1 and wire == 2:
            piece, score, ptype = "", 0.0, TYPE_NORMAL
            for f2, w2, v2 in _scan_fields(val):
                if f2 == 1 and w2 == 2:
                    piece = v2.decode("utf-8")
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", v2)[0]
                elif f2 == 3 and w2 == 0:
                    ptype = v2
            pieces.append((piece, score, ptype))
    if not pieces:
        raise ValueError("no pieces found — not a SentencePiece model?")
    return pieces


def serialize_model_proto(pieces: List[Tuple[str, float, int]]) -> bytes:
    """Inverse of parse_model_proto (used to build test fixtures and to
    export native vocabularies as real .model files)."""

    def varint(x: int) -> bytes:
        out = bytearray()
        while True:
            b = x & 0x7F
            x >>= 7
            if x:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    blob = bytearray()
    for piece, score, ptype in pieces:
        body = bytearray()
        pb = piece.encode("utf-8")
        body += b"\x0a" + varint(len(pb)) + pb          # field 1, wire 2
        body += b"\x15" + struct.pack("<f", score)      # field 2, wire 5
        if ptype != TYPE_NORMAL:
            body += b"\x18" + varint(ptype)             # field 3, wire 0
        blob += b"\x0a" + varint(len(body)) + bytes(body)
    return bytes(blob)


# --------------------------------------------------------------------------
# unigram Viterbi encoder
# --------------------------------------------------------------------------

class PurePythonSentencePiece:
    """Drop-in for the ``sentencepiece.SentencePieceProcessor`` API subset
    used by ``SentencePieceTokenizer``."""

    def __init__(self):
        self._pieces: List[Tuple[str, float, int]] = []
        self._ids: Dict[str, int] = {}
        self._scores: Dict[str, float] = {}
        self._max_len = 1
        self._unk_id = 0
        self._unk_score = 0.0

    def Load(self, path: str) -> "PurePythonSentencePiece":
        with open(path, "rb") as f:
            self.LoadFromSerializedProto(f.read())
        return self

    def LoadFromSerializedProto(self, data: bytes):
        self._pieces = parse_model_proto(data)
        self._ids = {}
        self._scores = {}
        self._max_len = 1
        min_score = 0.0
        unk_id = None
        for i, (piece, score, ptype) in enumerate(self._pieces):
            if piece not in self._ids:
                self._ids[piece] = i
            if ptype == TYPE_UNKNOWN and unk_id is None:
                unk_id = i
            if ptype in (TYPE_NORMAL, TYPE_USER_DEFINED):
                self._scores[piece] = score
                self._max_len = max(self._max_len, len(piece))
                min_score = min(min_score, score)
        self._unk_id = unk_id if unk_id is not None else 0
        self._unk_score = min_score - _UNK_PENALTY
        return self

    # -- API surface -------------------------------------------------------

    def GetPieceSize(self) -> int:
        return len(self._pieces)

    def unk_id(self) -> int:
        return self._unk_id

    def PieceToId(self, piece: str) -> int:
        return self._ids.get(piece, self._unk_id)

    def IdToPiece(self, idx: int) -> str:
        return self._pieces[idx][0]

    def EncodeAsPieces(self, text: str) -> List[str]:
        norm = self._normalize(text)
        if not norm:
            return []
        return self._viterbi(norm)

    # -- internals ---------------------------------------------------------

    @staticmethod
    def _normalize(text: str) -> str:
        """Approximate nmt_nfkc: NFKC, drop control chars, collapse
        whitespace; then escape spaces as ▁ with a dummy prefix
        (add_dummy_prefix=True, SentencePiece's default and XLNet's)."""
        text = unicodedata.normalize("NFKC", text)
        out = []
        for ch in text:
            if ch in ("\t", "\n", "\r") or unicodedata.category(ch) in (
                    "Cc", "Cf"):
                out.append(" ")
            else:
                out.append(ch)
        collapsed = " ".join("".join(out).split())
        if not collapsed:
            return ""
        return SPIECE_UNDERLINE + collapsed.replace(" ", SPIECE_UNDERLINE)

    def _viterbi(self, s: str) -> List[str]:
        n = len(s)
        NEG = float("-inf")
        # best[i] = (score, start_of_last_piece, piece_or_None-for-unk)
        best_score = [NEG] * (n + 1)
        back: List[Tuple[int, str | None]] = [(0, None)] * (n + 1)
        best_score[0] = 0.0
        scores = self._scores
        max_len = self._max_len
        for i in range(n):
            base = best_score[i]
            if base == NEG:
                continue
            hi = min(max_len, n - i)
            for ln in range(1, hi + 1):
                sub = s[i:i + ln]
                sc = scores.get(sub)
                if sc is not None and base + sc > best_score[i + ln]:
                    best_score[i + ln] = base + sc
                    back[i + ln] = (i, sub)
            # character-level unknown fallback keeps the lattice connected
            if base + self._unk_score > best_score[i + 1]:
                best_score[i + 1] = base + self._unk_score
                back[i + 1] = (i, None)
        # backtrack
        rev: List[Tuple[str, bool]] = []  # (piece, is_unk)
        pos = n
        while pos > 0:
            start, piece = back[pos]
            if piece is None:
                rev.append((s[start:pos], True))
            else:
                rev.append((piece, False))
            pos = start
        rev.reverse()
        # merge consecutive unknowns (SentencePiece emits one piece per
        # maximal unknown run)
        out: List[str] = []
        run = ""
        for piece, is_unk in rev:
            if is_unk:
                run += piece
            else:
                if run:
                    out.append(run)
                    run = ""
                out.append(piece)
        if run:
            out.append(run)
        return out
