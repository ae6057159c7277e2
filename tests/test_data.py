"""Tests for tokenization, alignment, packing and batching."""

import numpy as np
import pytest

from bert_multimodal_transformer_tpu.data import synthetic
from bert_multimodal_transformer_tpu.data.pipeline import (
    BatchIterator,
    align_modalities,
    convert_to_features,
    prepare_bert_input,
    prepare_xlnet_input,
)
from bert_multimodal_transformer_tpu.data.tokenization import (
    SimpleUnigramTokenizer,
    WordPieceTokenizer,
)

S = 12
DV, DA = 3, 4


@pytest.fixture
def bert_tok():
    return WordPieceTokenizer.from_wordlist(synthetic.vocabulary())


@pytest.fixture
def xlnet_tok():
    return SimpleUnigramTokenizer.from_wordlist(synthetic.vocabulary())


def test_wordpiece_splits_known_and_unknown(bert_tok):
    assert bert_tok.tokenize("good") == ["good"]
    # "goodly" is not a whole word in the vocab → wordpiece split
    pieces = bert_tok.tokenize("goodly")
    assert len(pieces) >= 2
    assert pieces[0] in bert_tok.vocab
    assert all(p.startswith("##") for p in pieces[1:])
    ids = bert_tok.convert_tokens_to_ids(pieces)
    assert all(isinstance(i, int) for i in ids)


def test_wordpiece_basic_tokenizer_punct_and_case(bert_tok):
    assert bert_tok.basic.tokenize("Hello, world!") == \
        ["hello", ",", "world", "!"]


def test_alignment_replicates_modalities(bert_tok):
    words = ["good", "goodly"]
    visual = np.arange(2 * DV, dtype=np.float32).reshape(2, DV)
    acoustic = np.arange(2 * DA, dtype=np.float32).reshape(2, DA)
    tokens, v, a = align_modalities(words, visual, acoustic, bert_tok)
    n_pieces_word2 = len(bert_tok.tokenize("goodly"))
    assert len(tokens) == 1 + n_pieces_word2
    # every subword of word 2 carries word 2's feature row
    for i in range(1, len(tokens)):
        np.testing.assert_array_equal(v[i], visual[1])
        np.testing.assert_array_equal(a[i], acoustic[1])


def test_bert_packing_right_pad(bert_tok):
    tokens = ["good", "bad"]
    visual = np.ones((2, DV), np.float32)
    acoustic = np.ones((2, DA), np.float32)
    ids, v, a, mask, seg = prepare_bert_input(
        tokens, visual, acoustic, bert_tok, S)
    assert len(ids) == S and len(mask) == S and len(seg) == S
    assert ids[0] == bert_tok.vocab["[CLS]"]
    assert ids[3] == bert_tok.vocab["[SEP]"]
    assert mask == [1] * 4 + [0] * (S - 4)
    assert seg == [0] * S
    # zero modality rows for CLS/SEP and padding
    assert v.shape == (S, DV)
    np.testing.assert_array_equal(v[0], 0)
    np.testing.assert_array_equal(v[3:], 0)
    np.testing.assert_array_equal(v[1:3], 1)


def test_xlnet_packing_left_pad(xlnet_tok):
    tokens = xlnet_tok.tokenize("good bad")
    n = len(tokens)
    visual = np.ones((n, DV), np.float32)
    acoustic = np.ones((n, DA), np.float32)
    ids, v, a, mask, seg = prepare_xlnet_input(
        tokens, visual, acoustic, xlnet_tok, S)
    pad = S - (n + 2)
    assert ids[:pad] == [xlnet_tok.pad_token_id] * pad
    assert mask[:pad] == [0] * pad
    assert seg[:pad] == [3] * pad
    # CLS is LAST with segment id 2
    assert ids[-1] == xlnet_tok.vocab["<cls>"]
    assert ids[-2] == xlnet_tok.vocab["<sep>"]
    assert seg[-1] == 2
    assert seg[pad:-1] == [0] * (n + 1)
    np.testing.assert_array_equal(v[:pad], 0)
    np.testing.assert_array_equal(v[pad:pad + n], 1)
    np.testing.assert_array_equal(v[-2:], 0)


def test_convert_to_features_shapes(bert_tok):
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=8, n_dev=2, n_test=2, seed=0)
    split = convert_to_features(data["train"], S, bert_tok, "bert")
    assert split.input_ids.shape == (8, S)
    assert split.visual.shape == (8, S, DV)
    assert split.acoustic.shape == (8, S, DA)
    assert split.label_ids.shape == (8,)
    assert split.input_ids.dtype == np.int32
    assert split.visual.dtype == np.float32


def test_convert_truncates_long_examples(bert_tok):
    words = ["good"] * 40
    visual = np.random.randn(40, DV).astype(np.float32)
    acoustic = np.random.randn(40, DA).astype(np.float32)
    ex = [((words, visual, acoustic), np.array([[1.0]]), "seg")]
    split = convert_to_features(ex, S, bert_tok, "bert")
    assert split.input_ids.shape == (1, S)
    assert split.input_mask[0].sum() == S  # fully used after truncation


def test_batch_iterator_train_drops_remainder(bert_tok):
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=10, n_dev=2, n_test=2)
    split = convert_to_features(data["train"], S, bert_tok, "bert")
    it = BatchIterator(split, 4, shuffle=True, drop_remainder=True, seed=0)
    batches = list(it)
    assert len(batches) == 2
    for batch, valid in batches:
        assert batch[0].shape[0] == 4
        assert valid.all()
    # different epochs see different orders
    first = list(it)[0][0][0]
    second = list(it)[0][0][0]
    assert not np.array_equal(first, second)


def test_batch_iterator_eval_pads_remainder(bert_tok):
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=2, n_dev=10, n_test=2)
    split = convert_to_features(data["dev"], S, bert_tok, "bert")
    it = BatchIterator(split, 4, shuffle=False, drop_remainder=False)
    batches = list(it)
    assert len(batches) == 3
    last_batch, last_valid = batches[-1]
    assert last_batch[0].shape[0] == 4
    assert last_valid.sum() == 2
    total_valid = sum(v.sum() for _, v in batches)
    assert total_valid == 10


def test_grain_pipeline_option(bert_tok):
    """Optional Grain loader yields the same fixed-shape batches."""
    pytest.importorskip("grain")
    from bert_multimodal_transformer_tpu.data.grain_pipeline import (
        GRAIN_AVAILABLE,
        iterate_tuple_batches,
        make_grain_loader,
    )

    assert GRAIN_AVAILABLE
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=12, n_dev=2, n_test=2)
    split = convert_to_features(data["train"], S, bert_tok, "bert")
    loader = make_grain_loader(split, 4, shuffle=True, seed=0)
    batches = list(iterate_tuple_batches(loader))
    assert len(batches) == 3
    for tup, valid in batches:
        assert tup[0].shape == (4, S)
        assert tup[1].shape == (4, S, DV)
        assert valid.all()
    # shuffled: batch contents differ from natural order
    natural = split.input_ids[:4]
    assert not np.array_equal(batches[0][0][0], natural)


def test_fast_packing_matches_prepare_helpers(bert_tok, xlnet_tok):
    """Lock the fast preallocated packing in convert_to_features to the
    reference-shaped prepare_* helpers (single source of truth check)."""
    from bert_multimodal_transformer_tpu.data.pipeline import (
        align_modalities,
    )

    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=12, n_dev=1, n_test=1, seed=9)
    for family, tok, packer in (
            ("bert", bert_tok, prepare_bert_input),
            ("xlnet", xlnet_tok, prepare_xlnet_input)):
        split = convert_to_features(data["train"], S, tok, family)
        for i, ex in enumerate(data["train"]):
            (words, visual, acoustic), _, _ = ex
            tokens, v, a = align_modalities(words, visual, acoustic, tok)
            if len(tokens) > S - 2:
                tokens, v, a = tokens[:S - 2], v[:S - 2], a[:S - 2]
            ids, v, a, mask, seg = packer(tokens, v, a, tok, S)
            np.testing.assert_array_equal(split.input_ids[i], ids)
            np.testing.assert_array_equal(split.input_mask[i], mask)
            np.testing.assert_array_equal(split.segment_ids[i], seg)
            np.testing.assert_allclose(split.visual[i], v, atol=1e-6)
            np.testing.assert_allclose(split.acoustic[i], a, atol=1e-6)


def test_wordpiece_unicode_handling(bert_tok):
    # accent stripping ("café" -> "cafe"), unicode punctuation split,
    # CJK char isolation
    assert bert_tok.basic.tokenize("Café") == ["cafe"]
    assert bert_tok.basic.tokenize("a“b”") == ["a", "“", "b",
                                                         "”"]
    toks = bert_tok.basic.tokenize("ab中cd")
    assert "中" in toks and toks == ["ab", "中", "cd"]


def test_native_tokenizer_unicode_fallback(bert_tok):
    pytest.importorskip("ctypes")
    from bert_multimodal_transformer_tpu.data import native

    if not native.available():
        pytest.skip("no native toolchain")
    nat = native.NativeWordPieceTokenizer(bert_tok)
    words = ["Café", "good"]
    ids_n, inv_n = nat.tokenize_words_to_ids(words)
    ids_p, inv_p = [], []
    for i, w in enumerate(words):
        pieces = bert_tok.tokenize(w)
        ids_p.extend(bert_tok.convert_tokens_to_ids(pieces))
        inv_p.extend([i] * len(pieces))
    assert ids_n == ids_p and inv_n == inv_p


def test_tokenizer_from_vocab_file_and_dispatch(tmp_path):
    from bert_multimodal_transformer_tpu.data.tokenization import (
        get_tokenizer,
    )

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "good", "bad", "##ly", "g", "o", "d", "l", "y"]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")
    tok = get_tokenizer("bert-base-uncased", str(path))
    assert tok.vocab["good"] == 5
    assert tok.tokenize("goodly") == ["good", "##ly"]
    assert tok.pad_token_id == 0

    # xlnet wordlist fallback dispatch
    wl = tmp_path / "words.txt"
    wl.write_text("good\nbad\n")
    xtok = get_tokenizer("xlnet-base-cased", str(wl))
    assert xtok.tokenize("good") == ["▁good"]

    with pytest.raises(ValueError, match="vocab"):
        get_tokenizer("bert-base-uncased", None)
    with pytest.raises(ValueError, match="bert-|xlnet-"):
        get_tokenizer("gpt2", str(path))


def test_set_up_data_loaders_grad_accum_semantics(tmp_path, bert_tok):
    """Reference semantics: accum=N means effective batch B*N per optimizer
    step and len/B/N optimizer steps per epoch."""
    from bert_multimodal_transformer_tpu.data.pipeline import (
        set_up_data_loaders,
    )

    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=32, n_dev=4, n_test=4)
    path = tmp_path / "d.pkl"
    synthetic.write_pickle(str(path), data)
    train_it, dev_it, test_it, num_steps = set_up_data_loaders(
        str(path), bert_tok, model_family="bert", max_seq_length=S,
        train_batch_size=4, dev_batch_size=4, test_batch_size=4,
        n_epochs=3, gradient_accumulation_step=2)
    batch, valid = next(iter(train_it))
    assert batch[0].shape[0] == 8  # B*N rows per jitted step
    assert len(train_it) == 4     # 32 / (4*2)
    assert num_steps == 4 * 3     # int(32/4/2) * epochs


def test_batch_iterator_seed_reproducibility(bert_tok):
    """Same seed -> same epoch-1 order (fresh iterators); the reference's
    seeding contract (multimodal_driver.py:289-308) applied to shuffling."""
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=16, n_dev=2, n_test=2)
    split = convert_to_features(data["train"], S, bert_tok, "bert")
    a = BatchIterator(split, 4, shuffle=True, drop_remainder=True, seed=7)
    b = BatchIterator(split, 4, shuffle=True, drop_remainder=True, seed=7)
    for (ba, _), (bb, _) in zip(a, b):
        np.testing.assert_array_equal(ba[0], bb[0])
    c = BatchIterator(split, 4, shuffle=True, drop_remainder=True, seed=8)
    firsts = [next(iter(c))[0][0], next(iter(
        BatchIterator(split, 4, shuffle=True, drop_remainder=True,
                      seed=7)))[0][0]]
    assert not np.array_equal(firsts[0], firsts[1])
