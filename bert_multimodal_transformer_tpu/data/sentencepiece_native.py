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

Piece types (all handled; cross-validated against the HF ``tokenizers``
Rust Unigram — the port of sentencepiece inference — in
tests/test_sentencepiece_native.py):

  * NORMAL — trie-matched with its trained log-prob score;
  * UNKNOWN / CONTROL / UNUSED — never matched from raw text;
  * USER_DEFINED — always segmented as one piece: matched with score
    ``len(piece) * max_score - 0.1`` (sentencepiece unigram_model.cc
    ``PopulateNodes``: "User defined symbol receives extra bonus to
    always be selected"), and protected verbatim from normalization
    (sentencepiece normalizer.cc's PrefixMatcher over user-defined
    symbols);
  * BYTE — byte fallback: when the model carries all 256 ``<0xNN>``
    pieces (the invariant ``--byte_fallback`` training guarantees),
    unknown spans are emitted as their UTF-8 bytes' pieces instead of
    one merged unk piece.

Normalization: SentencePiece's full "nmt_nfkc" normalizer applies a
precompiled character map; this implementation approximates it with NFKC +
control-character removal + whitespace collapsing, which agrees on the
ASCII/latin text MOSI/MOSEI transcripts contain. The approximation is
documented here rather than hidden — and is now normalizer-only: the
Viterbi/piece-type behavior is exact per the cross-validation above.
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


def _parse_byte_piece(piece: str) -> "int | None":
    """TYPE_BYTE pieces are spelled ``<0xNN>`` (uppercase hex); returns the
    byte value, or None for a malformed surface."""
    if (len(piece) == 6 and piece.startswith("<0x")
            and piece.endswith(">")):
        try:
            return int(piece[3:5], 16)
        except ValueError:
            return None
    return None


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
        self._user_defined: List[str] = []
        self._byte_to_piece: Dict[int, str] = {}
        self._byte_fallback = False

    def Load(self, path: str) -> "PurePythonSentencePiece":
        with open(path, "rb") as f:
            self.LoadFromSerializedProto(f.read())
        return self

    def LoadFromSerializedProto(self, data: bytes):
        self._pieces = parse_model_proto(data)
        self._ids = {}
        self._scores = {}
        self._user_defined = []
        self._byte_to_piece = {}
        self._max_len = 1
        # min/max over NORMAL pieces only, exactly as unigram_model.cc's
        # constructor computes min_score_/max_score_ (CONTROL/UNKNOWN/
        # BYTE/USER_DEFINED scores don't shape the unk penalty or the
        # user-defined bonus)
        min_score = 0.0
        max_score = 0.0
        have_normal = False
        unk_id = None
        for i, (piece, score, ptype) in enumerate(self._pieces):
            if piece not in self._ids:
                self._ids[piece] = i
            if ptype == TYPE_UNKNOWN and unk_id is None:
                unk_id = i
            if ptype == TYPE_NORMAL:
                self._scores[piece] = score
                self._max_len = max(self._max_len, len(piece))
                if have_normal:
                    min_score = min(min_score, score)
                    max_score = max(max_score, score)
                else:
                    min_score = max_score = score
                    have_normal = True
            elif ptype == TYPE_BYTE:
                b = _parse_byte_piece(piece)
                if b is not None and b not in self._byte_to_piece:
                    self._byte_to_piece[b] = piece
        # USER_DEFINED second pass (the bonus needs max_score): always
        # segmented as one piece — score = len*max_score − 0.1
        # (unigram_model.cc PopulateNodes: "User defined symbol receives
        # extra bonus to always be selected")
        for piece, score, ptype in self._pieces:
            if ptype == TYPE_USER_DEFINED:
                self._scores[piece] = len(piece) * max_score - 0.1
                self._max_len = max(self._max_len, len(piece))
                self._user_defined.append(piece)
        # longest-first for the normalizer's verbatim prefix matching
        self._user_defined.sort(key=len, reverse=True)
        # byte fallback requires the full byte alphabet — the invariant
        # --byte_fallback training guarantees; a partial set can't cover
        # arbitrary unknown spans, so it stays off (merged-unk pieces)
        self._byte_fallback = len(self._byte_to_piece) == 256
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

    def _normalize(self, text: str) -> str:
        """Approximate nmt_nfkc: NFKC, drop control chars, collapse
        whitespace; then escape spaces as ▁ with a dummy prefix
        (add_dummy_prefix=True, SentencePiece's default and XLNet's).

        USER_DEFINED symbol occurrences pass through VERBATIM — the real
        normalizer protects them with a PrefixMatcher (normalizer.cc) so
        e.g. an NFKC-altering symbol like "ﬁx" still reaches the trie as
        written. (Symbols containing whitespace are not protected from
        the collapse step — sentencepiece forbids those at training
        time.)"""
        if self._user_defined:
            segs = self._split_user_defined(text)
        else:
            segs = [(text, False)]
        parts = []
        for seg, verbatim in segs:
            if verbatim:
                parts.append(seg)
                continue
            seg = unicodedata.normalize("NFKC", seg)
            out = []
            for ch in seg:
                if ch in ("\t", "\n", "\r") or unicodedata.category(ch) in (
                        "Cc", "Cf"):
                    out.append(" ")
                else:
                    out.append(ch)
            parts.append("".join(out))
        collapsed = " ".join("".join(parts).split())
        if not collapsed:
            return ""
        return SPIECE_UNDERLINE + collapsed.replace(" ", SPIECE_UNDERLINE)

    def _split_user_defined(self, text: str) -> List[Tuple[str, bool]]:
        """Segment text into (chunk, is_user_defined_symbol); symbols are
        matched longest-first on the RAW (pre-normalization) text."""
        segs: List[Tuple[str, bool]] = []
        i = 0
        n = len(text)
        plain_start = 0
        while i < n:
            match = None
            for p in self._user_defined:  # longest-first
                if text.startswith(p, i):
                    match = p
                    break
            if match is None:
                i += 1
                continue
            if plain_start < i:
                segs.append((text[plain_start:i], False))
            segs.append((match, True))
            i += len(match)
            plain_start = i
        if plain_start < n:
            segs.append((text[plain_start:], False))
        return segs

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
        # maximal unknown run) — or, under byte fallback, expand the run
        # into its UTF-8 bytes' <0xNN> pieces (cross-validated against
        # the HF tokenizers Rust Unigram with byte_fallback=True)
        out: List[str] = []
        run = ""

        def flush(run: str):
            if not run:
                return
            if self._byte_fallback:
                for b in run.encode("utf-8"):
                    out.append(self._byte_to_piece[b])
            else:
                out.append(run)

        for piece, is_unk in rev:
            if is_unk:
                run += piece
            else:
                flush(run)
                run = ""
                out.append(piece)
        flush(run)
        return out
