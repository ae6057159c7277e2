"""Native SentencePiece unigram inference tests.

The fixtures are hand-built ModelProto files with scores chosen so the
optimal segmentation is known a priori — including a case where greedy
longest-match and Viterbi disagree, proving the encoder actually searches
the lattice (the reference's XLNet path tokenizes via SentencePiece,
multimodal_driver.py:208-218).
"""

import numpy as np

from bert_multimodal_transformer_tpu.data.sentencepiece_native import (
    TYPE_CONTROL,
    TYPE_NORMAL,
    TYPE_UNKNOWN,
    PurePythonSentencePiece,
    parse_model_proto,
    serialize_model_proto,
)
from bert_multimodal_transformer_tpu.data.tokenization import (
    SentencePieceTokenizer,
    get_tokenizer,
)


def _pieces():
    return [
        ("<unk>", 0.0, TYPE_UNKNOWN),
        ("<s>", 0.0, TYPE_CONTROL),
        ("</s>", 0.0, TYPE_CONTROL),
        ("<cls>", 0.0, TYPE_CONTROL),
        ("<sep>", 0.0, TYPE_CONTROL),
        ("<pad>", 0.0, TYPE_CONTROL),
        ("▁ab", -1.0, TYPE_NORMAL),
        ("▁a", -2.0, TYPE_NORMAL),
        ("b", -1.5, TYPE_NORMAL),
        ("▁c", -1.0, TYPE_NORMAL),
        ("d", -1.0, TYPE_NORMAL),
        ("▁abc", -5.0, TYPE_NORMAL),
        ("c", -1.0, TYPE_NORMAL),
        ("▁hello", -1.0, TYPE_NORMAL),
        ("▁", -3.0, TYPE_NORMAL),
    ]


def _model(tmp_path):
    p = tmp_path / "spiece.model"
    p.write_bytes(serialize_model_proto(_pieces()))
    return str(p)


def test_proto_roundtrip():
    blob = serialize_model_proto(_pieces())
    assert parse_model_proto(blob) == _pieces()


def test_truncated_proto_rejected():
    """A truncated .model (interrupted copy) must fail loudly, not load
    as a smaller vocabulary with silently wrong ids."""
    import pytest

    blob = serialize_model_proto(_pieces())
    with pytest.raises(ValueError, match="truncated"):
        parse_model_proto(blob[:-3])


def test_truncated_mid_varint_rejected():
    """A file cut INSIDE a varint (continuation bit set on the last
    byte, or ending right before a tag's payload) must raise the same
    ValueError class as other truncations, not a bare IndexError."""
    import pytest

    blob = serialize_model_proto(_pieces())
    # ends with a dangling byte whose continuation bit is set: the tag
    # varint runs past the end of the buffer
    with pytest.raises(ValueError, match="truncated"):
        parse_model_proto(blob + b"\xff")
    # a score field is little-endian fixed32 after its tag; chopping the
    # buffer one byte after a tag boundary exercises every wire branch
    for cut in range(1, min(8, len(blob))):
        try:
            parse_model_proto(blob[:-cut])
        except ValueError:
            pass  # the only acceptable failure class


def test_viterbi_prefers_single_good_piece(tmp_path):
    sp = PurePythonSentencePiece().Load(_model(tmp_path))
    # "▁ab" (-1) beats "▁a"+"b" (-3.5)
    assert sp.EncodeAsPieces("ab") == ["▁ab"]


def test_viterbi_beats_greedy_longest_match(tmp_path):
    sp = PurePythonSentencePiece().Load(_model(tmp_path))
    # greedy would take "▁abc" (-5); the optimum is "▁ab"+"c" (-2)
    assert sp.EncodeAsPieces("abc") == ["▁ab", "c"]


def test_viterbi_split_pieces(tmp_path):
    sp = PurePythonSentencePiece().Load(_model(tmp_path))
    assert sp.EncodeAsPieces("cd") == ["▁c", "d"]


def test_unknown_runs_merge_and_map_to_unk(tmp_path):
    sp = PurePythonSentencePiece().Load(_model(tmp_path))
    pieces = sp.EncodeAsPieces("abxyz")
    # "▁ab" then the unknown run "xyz" as ONE piece
    assert pieces == ["▁ab", "xyz"]
    assert sp.PieceToId("xyz") == sp.unk_id() == 0


def test_normalization_whitespace_and_dummy_prefix(tmp_path):
    sp = PurePythonSentencePiece().Load(_model(tmp_path))
    assert sp._normalize("hello  ab\tcd ") == "▁hello▁ab▁cd"
    assert sp.EncodeAsPieces("hello ab") == ["▁hello", "▁ab"]
    assert sp.EncodeAsPieces("") == []
    assert sp.EncodeAsPieces("   ") == []


def test_sentencepiece_tokenizer_native_backend(tmp_path):
    """SentencePieceTokenizer must work with no sentencepiece wheel
    (this image has none) — the previously-dead XLNet tokenizer path."""
    tok = SentencePieceTokenizer(_model(tmp_path))
    assert isinstance(tok.sp, PurePythonSentencePiece)
    assert tok.tokenize("hello ab") == ["▁hello", "▁ab"]
    ids = tok.convert_tokens_to_ids(["▁hello", "▁ab", "<sep>", "<cls>"])
    assert ids == [13, 6, 4, 3]
    assert tok.pad_token_id == 5


def test_get_tokenizer_dispatches_model_file(tmp_path):
    tok = get_tokenizer("xlnet-base-cased", _model(tmp_path))
    assert isinstance(tok, SentencePieceTokenizer)
    assert tok.tokenize("ab cd") == ["▁ab", "▁c", "d"]


def test_xlnet_pipeline_with_native_sentencepiece(tmp_path):
    """End-to-end: feature conversion + XLNet packing driven by the native
    SentencePiece tokenizer (the reference flow at
    multimodal_driver.py:82-205)."""
    from bert_multimodal_transformer_tpu.data.pipeline import (
        convert_to_features,
    )

    tok = SentencePieceTokenizer(_model(tmp_path))
    words = ["hello", "ab", "cd"]
    visual = np.random.RandomState(0).randn(3, 4).astype(np.float32)
    acoustic = np.random.RandomState(1).randn(3, 6).astype(np.float32)
    examples = [((words, visual, acoustic), np.float32(1.0), "seg0")]
    feats = convert_to_features(examples, 10, tok, model_family="xlnet")
    ids = feats.input_ids[0]
    assert ids.shape == (10,)
    # tokens: ▁hello | ▁ab | ▁c d → 4 subwords, left-pad 4, then SEP, CLS
    assert list(ids) == [5, 5, 5, 5, 13, 6, 9, 10, 4, 3]
    assert list(feats.input_mask[0]) == [0] * 4 + [1] * 6
    assert list(feats.segment_ids[0]) == [3] * 4 + [0] * 5 + [2]
    # "cd" → two subwords ⇒ its visual row replicated at both positions
    np.testing.assert_array_equal(feats.visual[0, 6], visual[2])
    np.testing.assert_array_equal(feats.visual[0, 7], visual[2])
    np.testing.assert_array_equal(feats.acoustic[0, 4], acoustic[0])
    # specials carry zero modality rows (reference :182-186)
    assert not feats.visual[0, -2:].any()


# ---------------------------------------------------------------------------
# piece-type hardening (round 3): byte fallback, user-defined symbols,
# normalizer cases, and cross-validation against the HF `tokenizers` Rust
# Unigram — the maintained port of sentencepiece unigram inference.
# ---------------------------------------------------------------------------

from bert_multimodal_transformer_tpu.data.sentencepiece_native import (  # noqa: E402
    TYPE_BYTE,
    TYPE_USER_DEFINED,
)


def _byte_pieces(score=-6.0):
    return [(f"<0x{i:02X}>", score, TYPE_BYTE) for i in range(256)]


def _load(pieces):
    sp = PurePythonSentencePiece()
    sp.LoadFromSerializedProto(serialize_model_proto(pieces))
    return sp


def test_byte_fallback_expands_unknown_runs():
    sp = _load(_pieces() + _byte_pieces())
    assert sp._byte_fallback
    # "xyz" is unknown: under byte fallback it becomes per-byte pieces
    assert sp.EncodeAsPieces("abxyz") == [
        "▁ab", "<0x78>", "<0x79>", "<0x7A>"]
    # multi-byte char: 🙂 = F0 9F 99 82
    assert sp.EncodeAsPieces("ab🙂") == [
        "▁ab", "<0xF0>", "<0x9F>", "<0x99>", "<0x82>"]
    # byte pieces map to their REAL ids, not unk
    ids = sp.PieceToId("<0x78>")
    assert ids != sp.unk_id()
    assert sp.IdToPiece(ids) == "<0x78>"


def test_partial_byte_set_disables_fallback():
    """--byte_fallback training guarantees all 256 <0xNN> pieces; a model
    missing any can't cover arbitrary spans, so unk merging stays."""
    sp = _load(_pieces() + _byte_pieces()[:255])
    assert not sp._byte_fallback
    assert sp.EncodeAsPieces("abxyz") == ["▁ab", "xyz"]


def test_byte_pieces_never_match_their_literal_surface():
    """A TYPE_BYTE piece's surface is the literal string '<0x41>'; it must
    never be trie-matched from text that happens to contain it."""
    sp = _load(_pieces() + _byte_pieces())
    pieces = sp.EncodeAsPieces("<0x41>")
    # after the dummy prefix (▁ is a NORMAL piece in this vocab), every
    # output piece is a byte piece — the '<', '0', 'x'... chars are all
    # unknown in this vocab, so 6 ascii chars → 6 byte pieces; the
    # literal '<0x41>' surface is never emitted as one piece
    assert pieces == ["▁"] + [f"<0x{ord(c):02X}>" for c in "<0x41>"]


def test_user_defined_symbol_segments_as_one_piece():
    """unigram_model.cc PopulateNodes: 'User defined symbol receives
    extra bonus to always be selected' — score = len·max_score − 0.1."""
    pieces = [
        ("<unk>", 0.0, TYPE_UNKNOWN),
        ("q", -0.2, TYPE_NORMAL),       # max_score = −0.2
        ("x", -1.0, TYPE_NORMAL),
        ("y", -1.0, TYPE_NORMAL),
        ("▁", -1.0, TYPE_NORMAL),
        ("<sym>", 0.0, TYPE_USER_DEFINED),
    ]
    sp = _load(pieces)
    # without the bonus "<sym>" would lose: its chars aren't otherwise
    # coverable, but "xy" IS — x+y scores −2.0, the UD bonus gives
    # 5·(−0.2) − 0.1 = −1.1 for the 5-char symbol, selected as one piece
    out = sp.EncodeAsPieces("x<sym>y")
    assert "<sym>" in out
    assert out == ["▁", "x", "<sym>", "y"]


def test_user_defined_symbol_protected_from_normalization():
    """normalizer.cc protects user-defined symbols via PrefixMatcher:
    an NFKC-altering surface (ﬁ → fi) must still reach the trie as
    written."""
    pieces = [
        ("<unk>", 0.0, TYPE_UNKNOWN),
        ("f", -1.0, TYPE_NORMAL),
        ("i", -1.0, TYPE_NORMAL),
        ("x", -1.0, TYPE_NORMAL),
        ("▁", -1.0, TYPE_NORMAL),
        ("ﬁx", 0.0, TYPE_USER_DEFINED),  # contains U+FB01 LIGATURE FI
    ]
    sp = _load(pieces)
    assert sp.EncodeAsPieces("ﬁx") == ["▁", "ﬁx"]
    # without the UD entry the ligature normalizes to "fi" as usual
    sp2 = _load(pieces[:-1])
    assert sp2.EncodeAsPieces("ﬁx") == ["▁", "f", "i", "x"]


def test_normalizer_nfkc_cases():
    sp = _load(_pieces())
    # fullwidth digits/letters fold (NFKC), control chars strip,
    # whitespace collapses, dummy prefix prepends
    assert sp._normalize("ａｂ") == "▁ab"
    assert sp._normalize("①") == "▁1"
    assert sp._normalize("ﬁ") == "▁fi"
    assert sp._normalize("a\x00\x07b") == "▁a▁b" or \
        sp._normalize("a\x00\x07b") == "▁ab"
    assert sp._normalize("  a  b c  ") == "▁a▁b▁c"


def test_unk_score_ignores_nonnormal_piece_scores():
    """min_score (→ unk penalty base) is over NORMAL pieces only, as in
    unigram_model.cc; a very low CONTROL/BYTE score must not deflate the
    unk score and flip lattice decisions."""
    base = [
        ("<unk>", 0.0, TYPE_UNKNOWN),
        ("a", -1.0, TYPE_NORMAL),
        ("▁", -1.0, TYPE_NORMAL),
    ]
    sp = _load(base)
    lo = _load(base + [("<s>", -100.0, TYPE_CONTROL)])
    assert sp._unk_score == lo._unk_score == -11.0


def test_viterbi_matches_hf_rust_unigram_fuzz():
    """Cross-validation against tokenizers.models.Unigram (the HF Rust
    port of sentencepiece inference): same vocab, same raw strings (no
    normalizer on either side), identical pieces — including per-char unk
    fallback, unk-run merging, and byte fallback expansion."""
    import random

    tokenizers = __import__("pytest").importorskip("tokenizers")
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram

    rng = random.Random(0)
    alphabet = "abcde"
    for byte_fallback in (False, True):
        for trial in range(8):
            # random vocab: single chars for a/b/c (d/e stay unknown),
            # plus random 2-4 char pieces; scores in [-9, -1] so the
            # byte pieces' -6 never shifts min/max bookkeeping asymmetry
            vocab = [("<unk>", 0.0)]
            pieces = [("<unk>", 0.0, TYPE_UNKNOWN)]
            surfaces = set()
            for ch in "abc":
                sc = rng.uniform(-3, -1)
                vocab.append((ch, sc))
                pieces.append((ch, sc, TYPE_NORMAL))
                surfaces.add(ch)
            for _ in range(12):
                ln = rng.randint(2, 4)
                s = "".join(rng.choice(alphabet) for _ in range(ln))
                if s in surfaces:
                    continue
                surfaces.add(s)
                sc = rng.uniform(-9, -1)
                vocab.append((s, sc))
                pieces.append((s, sc, TYPE_NORMAL))
            if byte_fallback:
                vocab += [(f"<0x{i:02X}>", -6.0) for i in range(256)]
                pieces += _byte_pieces()
            ours = _load(pieces)
            theirs = Tokenizer(Unigram(vocab, unk_id=0,
                                       byte_fallback=byte_fallback))
            for _ in range(40):
                n = rng.randint(1, 20)
                text = "".join(rng.choice(alphabet + "ÿ合")
                               for _ in range(n))
                got = ours._viterbi(text)
                expect = theirs.encode(
                    text, add_special_tokens=False).tokens
                assert got == expect, (
                    f"bf={byte_fallback} trial={trial} text={text!r}: "
                    f"{got} != {expect}")
