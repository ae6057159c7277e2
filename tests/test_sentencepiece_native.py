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
