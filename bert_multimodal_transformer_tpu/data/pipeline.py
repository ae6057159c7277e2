"""Host-side data pipeline.

Re-derivation of the reference's feature conversion and batching
(multimodal_driver.py:60-286): per-example word→subword alignment with
modality replication, BERT right-padded / XLNet left-padded packing, and
split assembly into fixed-shape device-ready numpy buffers.

TPU-first departures from the torch original:
  * The whole split is packed once into contiguous numpy arrays (the
    datasets are tiny — the reference itself materializes TensorDatasets,
    multimodal_driver.py:226-246); batches are zero-copy views fed to jit.
  * All shapes are static: every batch is exactly [B, max_seq_length, ·];
    the final ragged batch is dropped in training (shuffled anyway) and
    padded+masked in eval so metrics cover every example.
  * Optional C++ fast path (data/_native) for the tokenize/align hot loop.
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class PackedSplit:
    """One split packed to fixed shapes.

    input_ids/input_mask/segment_ids: [N, S] int32
    visual: [N, S, Dv] float32; acoustic: [N, S, Da] float32
    label_ids: [N] float32
    """

    input_ids: np.ndarray
    visual: np.ndarray
    acoustic: np.ndarray
    input_mask: np.ndarray
    segment_ids: np.ndarray
    label_ids: np.ndarray

    def __len__(self) -> int:
        return self.input_ids.shape[0]

    def take(self, idx: np.ndarray) -> "PackedSplit":
        return PackedSplit(*(getattr(self, f.name)[idx]
                             for f in dataclasses.fields(self)))

    def as_tuple(self):
        return (self.input_ids, self.visual, self.acoustic, self.input_mask,
                self.segment_ids, self.label_ids)


def align_modalities(
    words: Sequence[str],
    visual: np.ndarray,
    acoustic: np.ndarray,
    tokenizer,
) -> Tuple[List[str], np.ndarray, np.ndarray]:
    """Tokenize word-by-word and replicate each word's visual/acoustic row
    for every subword piece (reference multimodal_driver.py:89-106)."""
    tokens: List[str] = []
    inversions: List[int] = []
    for idx, word in enumerate(words):
        pieces = tokenizer.tokenize(word)
        tokens.extend(pieces)
        inversions.extend([idx] * len(pieces))
    assert len(tokens) == len(inversions)
    if inversions:
        inv = np.asarray(inversions, np.int64)
        visual = np.asarray(visual)[inv]
        acoustic = np.asarray(acoustic)[inv]
    else:
        visual = np.zeros((0, np.asarray(visual).shape[-1]))
        acoustic = np.zeros((0, np.asarray(acoustic).shape[-1]))
    return tokens, visual, acoustic


def _to_ids(tokens, tokenizer) -> List[int]:
    """tokens may be subword strings or already-converted ids (native
    tokenizer fast path)."""
    if tokens and isinstance(tokens[0], (int, np.integer)):
        return [int(t) for t in tokens]
    return tokenizer.convert_tokens_to_ids(list(tokens))


def prepare_bert_input(tokens, visual, acoustic, tokenizer, max_seq_length):
    """[CLS] tokens [SEP], zero modality rows for specials, right-pad with
    zeros (reference multimodal_driver.py:143-173)."""
    dv, da = visual.shape[-1], acoustic.shape[-1]
    visual = np.concatenate([np.zeros((1, dv)), visual, np.zeros((1, dv))])
    acoustic = np.concatenate([np.zeros((1, da)), acoustic,
                               np.zeros((1, da))])
    cls_id, sep_id = tokenizer.convert_tokens_to_ids(
        [tokenizer.cls_token, tokenizer.sep_token])
    input_ids = [cls_id] + _to_ids(tokens, tokenizer) + [sep_id]
    n = len(input_ids)
    pad = max_seq_length - n
    input_ids = input_ids + [0] * pad
    input_mask = [1] * n + [0] * pad
    segment_ids = [0] * max_seq_length
    visual = np.concatenate([visual, np.zeros((pad, dv))])
    acoustic = np.concatenate([acoustic, np.zeros((pad, da))])
    return input_ids, visual, acoustic, input_mask, segment_ids


def prepare_xlnet_input(tokens, visual, acoustic, tokenizer, max_seq_length):
    """tokens [SEP] [CLS] (CLS last), segments 0…0,2, LEFT-pad: ids with
    pad_token_id, mask 0, segments 3, leading zero modality rows
    (reference multimodal_driver.py:176-205)."""
    dv, da = visual.shape[-1], acoustic.shape[-1]
    visual = np.concatenate([visual, np.zeros((2, dv))])
    acoustic = np.concatenate([acoustic, np.zeros((2, da))])
    sep_id, cls_id = tokenizer.convert_tokens_to_ids(
        [tokenizer.sep_token, tokenizer.cls_token])
    input_ids = _to_ids(tokens, tokenizer) + [sep_id, cls_id]
    n = len(input_ids)
    segment_ids = [0] * (n - 1) + [2]
    pad = max_seq_length - n
    input_ids = [tokenizer.pad_token_id] * pad + input_ids
    input_mask = [0] * pad + [1] * n
    segment_ids = [3] * pad + segment_ids
    visual = np.concatenate([np.zeros((pad, dv)), visual])
    acoustic = np.concatenate([np.zeros((pad, da)), acoustic])
    return input_ids, visual, acoustic, input_mask, segment_ids


_PACKERS = {"bert": prepare_bert_input, "xlnet": prepare_xlnet_input}


def convert_to_features(
    examples: Sequence[Any],
    max_seq_length: int,
    tokenizer,
    model_family: str = "bert",
    visual_dim: Optional[int] = None,
    acoustic_dim: Optional[int] = None,
) -> PackedSplit:
    """Pack a list of ((words, visual, acoustic), label, segment) examples —
    the documented pickle layout (reference README.md:134-149) — into a
    PackedSplit. Mirrors convert_to_features (multimodal_driver.py:82-140),
    including truncation to max_seq_length−2 before the two specials."""
    packer = _PACKERS[model_family]
    # Native (C++) tokenize/align fast path when the tokenizer provides it.
    native = hasattr(tokenizer, "tokenize_words_to_ids")
    ids_l, vis_l, ac_l, mask_l, seg_l, lab_l = [], [], [], [], [], []
    for example in examples:
        (words, visual, acoustic), label_id, _segment = example
        if native:
            token_ids, inversions = tokenizer.tokenize_words_to_ids(
                list(words))
            tokens = token_ids
            inv = np.asarray(inversions, np.int64)
            visual = np.asarray(visual)[inv]
            acoustic = np.asarray(acoustic)[inv]
        else:
            tokens, visual, acoustic = align_modalities(
                words, visual, acoustic, tokenizer)
        if len(tokens) > max_seq_length - 2:
            tokens = tokens[: max_seq_length - 2]
            visual = visual[: max_seq_length - 2]
            acoustic = acoustic[: max_seq_length - 2]
        input_ids, visual, acoustic, input_mask, segment_ids = packer(
            tokens, visual, acoustic, tokenizer, max_seq_length)
        assert len(input_ids) == max_seq_length
        assert visual.shape[0] == max_seq_length
        assert acoustic.shape[0] == max_seq_length
        ids_l.append(input_ids)
        vis_l.append(visual)
        ac_l.append(acoustic)
        mask_l.append(input_mask)
        seg_l.append(segment_ids)
        lab_l.append(np.float32(np.asarray(label_id).reshape(())))
    if visual_dim is None:
        visual_dim = vis_l[0].shape[-1] if vis_l else 0
    if acoustic_dim is None:
        acoustic_dim = ac_l[0].shape[-1] if ac_l else 0
    n = len(ids_l)
    return PackedSplit(
        input_ids=np.asarray(ids_l, np.int32).reshape(n, max_seq_length),
        visual=np.asarray(vis_l, np.float32).reshape(
            n, max_seq_length, visual_dim),
        acoustic=np.asarray(ac_l, np.float32).reshape(
            n, max_seq_length, acoustic_dim),
        input_mask=np.asarray(mask_l, np.int32),
        segment_ids=np.asarray(seg_l, np.int32),
        label_ids=np.asarray(lab_l, np.float32),
    )


def load_pickle_splits(path: str) -> Dict[str, list]:
    """Load the {train/dev/test: [examples]} pickle the reference consumes
    (multimodal_driver.py:249-255)."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    for split in ("train", "dev", "test"):
        if split not in data:
            raise ValueError(f"dataset pickle missing split {split!r}")
    return data


class BatchIterator:
    """Fixed-shape minibatch iterator over a PackedSplit.

    ``drop_remainder=True`` (training): shuffled epochs of exactly-B batches.
    ``drop_remainder=False`` (eval): the last batch is zero-padded to B and
    accompanied by a per-example validity mask so every example is scored
    (the reference instead shuffles dev/test and accepts ragged batches,
    multimodal_driver.py:269-279).
    """

    def __init__(self, split: PackedSplit, batch_size: int, *,
                 shuffle: bool, drop_remainder: bool,
                 seed: int = 0):
        self.split = split
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.split)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[tuple, np.ndarray]]:
        n = len(self.split)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        b = self.batch_size
        n_full = n // b
        for i in range(n_full):
            idx = order[i * b:(i + 1) * b]
            yield self.split.take(idx).as_tuple(), np.ones(b, bool)
        rem = n - n_full * b
        if rem and not self.drop_remainder:
            idx = order[n_full * b:]
            batch = self.split.take(idx)
            padded = tuple(
                np.concatenate(
                    [arr, np.zeros((b - rem,) + arr.shape[1:], arr.dtype)])
                for arr in batch.as_tuple())
            valid = np.zeros(b, bool)
            valid[:rem] = True
            yield padded, valid


def set_up_data_loaders(
    pickle_path: str,
    tokenizer,
    *,
    model_family: str,
    max_seq_length: int,
    train_batch_size: int,
    dev_batch_size: int,
    test_batch_size: int,
    n_epochs: int,
    gradient_accumulation_step: int = 1,
    seed: int = 0,
) -> Tuple[BatchIterator, BatchIterator, BatchIterator, int]:
    """End-to-end split setup mirroring set_up_data_loader
    (multimodal_driver.py:249-286), including the optimizer-step count."""
    data = load_pickle_splits(pickle_path)
    splits = {
        name: convert_to_features(data[name], max_seq_length, tokenizer,
                                  model_family)
        for name in ("train", "dev", "test")
    }
    num_train_optimization_steps = int(
        len(splits["train"]) / train_batch_size / gradient_accumulation_step
    ) * n_epochs
    train_it = BatchIterator(splits["train"], train_batch_size,
                             shuffle=True, drop_remainder=True, seed=seed)
    dev_it = BatchIterator(splits["dev"], dev_batch_size, shuffle=False,
                           drop_remainder=False)
    test_it = BatchIterator(splits["test"], test_batch_size, shuffle=False,
                            drop_remainder=False)
    return train_it, dev_it, test_it, num_train_optimization_steps
