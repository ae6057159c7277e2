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


# --------------------------------------------------------------------------
# precompiled charsmap (exact nmt_nfkc) — normalizer.cc port
# --------------------------------------------------------------------------

from bert_multimodal_transformer_tpu.data.sentencepiece_native import (  # noqa: E402
    DEFAULT_NORMALIZER_SPEC,
    PrecompiledNormalizer,
    _darts_common_prefix_search,
    build_darts,
    build_nmt_nfkc_rules,
    build_precompiled_charsmap,
    parse_normalizer_spec,
)


def test_darts_roundtrip_vs_bruteforce():
    """The darts-clone double-array reader and builder agree with a
    brute-force prefix scan on random key sets (incl. nested prefixes
    and shared stems)."""
    import random

    rng = random.Random(7)
    for trial in range(6):
        keys = set()
        while len(keys) < 40:
            ln = rng.randint(1, 5)
            keys.add(bytes(rng.randrange(1, 8) for _ in range(ln)))
        items = [(k, i) for i, k in enumerate(sorted(keys))]
        units = build_darts(items)
        table = dict(items)
        for _ in range(200):
            q = bytes(rng.randrange(1, 8) for _ in range(rng.randint(1, 8)))
            got = _darts_common_prefix_search(units, q)
            expect = [(table[q[:ln]], ln) for ln in range(1, len(q) + 1)
                      if q[:ln] in table]
            assert got == expect, (trial, q, got, expect)


def test_precompiled_charsmap_matches_rust_precompiled_fuzz():
    """The decoder + rewrite loop agree with the HF tokenizers Rust
    ``Precompiled`` normalizer (the Rust port of the same blob format)
    on fuzzed text. CRLF is excluded: the Rust port normalizes per
    grapheme cluster and "\\r\\n" is ONE grapheme, so it rewrites the
    pair with a single rule where sentencepiece C++ (this port's
    target) matches byte-wise longest-prefix — see the dedicated test
    below."""
    import random

    tokenizers = __import__("pytest").importorskip("tokenizers")
    from tokenizers.normalizers import Precompiled

    rules = build_nmt_nfkc_rules(max_cp=0x3100)  # latin+kana+enclosed
    blob = build_precompiled_charsmap(rules)
    mine = PrecompiledNormalizer(blob)
    theirs = Precompiled(blob)
    rng = random.Random(11)
    pools = ["abc ABC xyz", "ａｂｃＡＢＣ１２３", "ﬁﬂﬀ½¼①②",
             "ｶﾞｷﾞｸﾞ｡｢｣", "\t\n\x0b\x07\x00 ", "日本語カタカナ",
             "​‍﻿ ", "éèêë"]
    for _ in range(1500):
        pool = rng.choice(pools) + "a "
        s = "".join(rng.choice(pool) for _ in range(rng.randint(1, 24)))
        got = mine.normalize(s, add_dummy_prefix=False,
                             remove_extra_whitespaces=False,
                             escape_whitespaces=False)
        assert got == theirs.normalize_str(s), repr(s)


def test_precompiled_crlf_byte_longest_prefix_semantics():
    """sentencepiece C++ rewrites byte-wise: "\r\n" is TWO rule
    applications (two spaces raw); the Rust port emits one. Under the
    stock flags (remove_extra_whitespaces=True) the outputs coincide —
    which is why the Rust port survives XNLI — but the raw semantics
    this port implements are the C++ ones the reference's slow
    XLNetTokenizer actually runs."""
    blob = build_precompiled_charsmap(build_nmt_nfkc_rules(max_cp=0x100))
    pn = PrecompiledNormalizer(blob)
    assert pn.normalize("a\r\nb", add_dummy_prefix=False,
                        remove_extra_whitespaces=False,
                        escape_whitespaces=False) == "a  b"
    assert pn.normalize("a\r\nb") == "▁a▁b"


def test_precompiled_longest_rule_wins():
    """NormalizePrefix picks the LONGEST matching rule (normalizer.cc
    keeps the max-length trie hit), incl. multi-codepoint keys."""
    blob = build_precompiled_charsmap(
        {"a": "X", "ab": "Y", "abc": "Z", "é": "e"})
    pn = PrecompiledNormalizer(blob)
    raw = dict(add_dummy_prefix=False, remove_extra_whitespaces=False,
               escape_whitespaces=False)
    assert pn.normalize("abcab a é", **raw) == "ZY X e"


def test_precompiled_invalid_utf8_and_empty_replacement():
    blob = build_precompiled_charsmap(build_nmt_nfkc_rules(max_cp=0x100))
    pn = PrecompiledNormalizer(blob)
    # malformed lead byte: U+FFFD, consuming exactly one byte
    assert pn.normalize_prefix(b"\xff\xfea", 0) == (b"\xef\xbf\xbd", 1)
    # overlong encoding of '/' is invalid
    assert pn.normalize_prefix(b"\xc0\xaf", 0) == (b"\xef\xbf\xbd", 1)
    # a control char maps to the EMPTY replacement and disappears
    assert pn.normalize("a\x07b", add_dummy_prefix=False,
                        remove_extra_whitespaces=False,
                        escape_whitespaces=False) == "ab"


def test_precompiled_flag_matrix():
    blob = build_precompiled_charsmap(build_nmt_nfkc_rules(max_cp=0x100))
    pn = PrecompiledNormalizer(blob)
    s = "  hello\t world  "
    assert pn.normalize(s) == "▁hello▁world"
    assert pn.normalize(s, add_dummy_prefix=False) == "hello▁world"
    assert pn.normalize(s, escape_whitespaces=False) == " hello world"
    assert pn.normalize(s, remove_extra_whitespaces=False) == \
        "▁▁▁hello▁▁world▁▁"


def test_normalizer_spec_roundtrip_and_exact_chain(tmp_path):
    """A fixture .model with an embedded charsmap + non-default flags
    round-trips through serialize/parse, and EncodeAsPieces runs the
    EXACT normalizer (proved with a rule NFKC would never apply)."""
    rules = build_nmt_nfkc_rules(max_cp=0x100)
    rules["Q"] = "ab"          # marker rule: only the charsmap knows it
    blob = build_precompiled_charsmap(rules)
    spec = {"name": "nmt_nfkc", "precompiled_charsmap": blob,
            "add_dummy_prefix": False}
    data = serialize_model_proto(_pieces(), normalizer_spec=spec)
    parsed = parse_normalizer_spec(data)
    assert parsed["name"] == "nmt_nfkc"
    assert parsed["precompiled_charsmap"] == blob
    assert parsed["add_dummy_prefix"] is False
    assert parsed["remove_extra_whitespaces"] is True
    sp = PurePythonSentencePiece()
    sp.LoadFromSerializedProto(data)
    assert sp._precompiled is not None
    # "Q" -> "ab" via the charsmap (NFKC alone never does that), then
    # Viterbi segments "ab" with NO dummy prefix per the spec flag:
    # "a" is out-of-vocab bare (only "▁a" exists) → unk char + "b"
    assert sp.EncodeAsPieces("Q") == ["a", "b"]
    # default-spec model: dummy prefix present
    data2 = serialize_model_proto(
        _pieces(), normalizer_spec={"precompiled_charsmap": blob})
    sp2 = PurePythonSentencePiece()
    sp2.LoadFromSerializedProto(data2)
    assert sp2.EncodeAsPieces("Q") == ["▁ab"]
    assert sp2.EncodeAsPieces("hello  ab\tcd ") == \
        ["▁hello", "▁ab", "▁c", "d"]


def test_exact_chain_matches_rust_full_pipeline():
    """Full chain cross-validation: my normalize (exact charsmap) +
    Viterbi == Rust Precompiled + default-flag emulation + Rust
    Unigram, on fuzzed text under the stock XLNet flags."""
    import random
    import re

    tokenizers = __import__("pytest").importorskip("tokenizers")
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram
    from tokenizers.normalizers import Precompiled

    rules = build_nmt_nfkc_rules(max_cp=0x3100)
    blob = build_precompiled_charsmap(rules)
    pieces = _pieces()
    data = serialize_model_proto(
        pieces, normalizer_spec={"name": "nmt_nfkc",
                                 "precompiled_charsmap": blob})
    ours = PurePythonSentencePiece()
    ours.LoadFromSerializedProto(data)
    vocab = [(p, s) for p, s, _t in pieces]
    rust_uni = Tokenizer(Unigram(vocab, unk_id=0, byte_fallback=False))
    rust_norm = Precompiled(blob)
    rng = random.Random(3)
    pool = "ab c d hello ＡＢ　ｈｅｌｌｏ\t①ﬁ"
    for _ in range(300):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(1, 30)))
        norm = rust_norm.normalize_str(s)
        norm = re.sub(" +", " ", norm).strip(" ")     # remove_extra_ws
        norm = ("▁" + norm.replace(" ", "▁")) if norm else ""  # prefix+escape
        expect = (rust_uni.encode(norm, add_special_tokens=False).tokens
                  if norm else [])
        assert ours.EncodeAsPieces(s) == expect, repr(s)


def test_nmt_nfkc_rules_content():
    rules = build_nmt_nfkc_rules()
    assert rules["\t"] == " " and rules["​"] == " "
    assert rules["\x07"] == "" and rules["\x9f"] == ""
    assert rules["①"] == "1" and rules["ﬁ"] == "fi"
    assert "～" not in rules          # FULL-WIDTH TILDE kept verbatim
    assert rules["﻿"] == " "


def test_user_defined_symbol_protected_on_exact_path():
    """PrefixMatcher precedence inside NormalizePrefix: a user-defined
    symbol whose surface the charsmap would rewrite (ﬁ → fi) reaches
    the trie verbatim when the exact normalizer is active."""
    blob = build_precompiled_charsmap(build_nmt_nfkc_rules(max_cp=0x10000))
    from bert_multimodal_transformer_tpu.data.sentencepiece_native import (
        TYPE_USER_DEFINED,
    )
    pieces = [
        ("<unk>", 0.0, TYPE_UNKNOWN),
        ("f", -1.0, TYPE_NORMAL),
        ("i", -1.0, TYPE_NORMAL),
        ("x", -1.0, TYPE_NORMAL),
        ("▁", -1.0, TYPE_NORMAL),
        ("ﬁx", 0.0, TYPE_USER_DEFINED),
    ]
    data = serialize_model_proto(
        pieces, normalizer_spec={"precompiled_charsmap": blob})
    sp = PurePythonSentencePiece()
    sp.LoadFromSerializedProto(data)
    assert sp._precompiled is not None
    assert sp.EncodeAsPieces("ﬁx") == ["▁", "ﬁx"]
    data2 = serialize_model_proto(
        pieces[:-1], normalizer_spec={"precompiled_charsmap": blob})
    sp2 = PurePythonSentencePiece()
    sp2.LoadFromSerializedProto(data2)
    assert sp2.EncodeAsPieces("ﬁx") == ["▁", "f", "i", "x"]
