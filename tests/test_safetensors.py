"""Pure-numpy safetensors IO: cross-validated against the real
safetensors library in both directions, plus the --pretrained_checkpoint
dispatch (real HF checkpoints ship model.safetensors today; the
reference's from_pretrained contract, multimodal_driver.py:316-323,
accepts either format)."""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np
import pytest

from bert_multimodal_transformer_tpu.utils.convert import (
    load_torch_state_dict,
)
from bert_multimodal_transformer_tpu.utils.safetensors_io import (
    load_safetensors,
    save_safetensors,
)


def _tensors():
    rng = np.random.RandomState(0)
    return {
        "a.weight": rng.randn(4, 8).astype(np.float32),
        "a.bias": rng.randn(8).astype(np.float16),
        "ids": rng.randint(0, 100, (3, 5)).astype(np.int64),
        "flag": np.array([True, False]),
        "scalar": np.array(3.5, dtype=np.float32),
        "small": rng.randint(-3, 3, (2,)).astype(np.int8),
    }


def test_roundtrip_self(tmp_path):
    p = str(tmp_path / "m.safetensors")
    t = _tensors()
    save_safetensors(p, t, metadata={"format": "pt"})
    back = load_safetensors(p)
    assert set(back) == set(t)
    for k in t:
        assert back[k].dtype == t[k].dtype
        np.testing.assert_array_equal(back[k], t[k])


def test_reader_accepts_real_library_files(tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    p = str(tmp_path / "lib.safetensors")
    t = _tensors()
    st.save_file(t, p)
    back = load_safetensors(p)
    for k in t:
        np.testing.assert_array_equal(back[k], t[k])


def test_real_library_accepts_written_files(tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    p = str(tmp_path / "mine.safetensors")
    t = _tensors()
    save_safetensors(p, t)
    back = st.load_file(p)
    for k in t:
        np.testing.assert_array_equal(back[k], t[k])


def test_bf16_widens_exactly(tmp_path):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    p = str(tmp_path / "bf16.safetensors")
    x = torch.randn(5, 7, dtype=torch.float32).to(torch.bfloat16)
    save_file({"w": x}, p)
    back = load_safetensors(p)
    assert back["w"].dtype == np.float32
    np.testing.assert_array_equal(back["w"], x.float().numpy())


def test_load_state_dict_dispatch(tmp_path):
    """load_torch_state_dict: explicit .safetensors path, and directory
    fallback when no pytorch_model.bin exists."""
    t = {k: v for k, v in _tensors().items() if v.dtype != np.dtype("?")}
    d = tmp_path / "ckpt"
    d.mkdir()
    save_safetensors(str(d / "model.safetensors"), t)
    for path in (str(d / "model.safetensors"), str(d)):
        back = load_torch_state_dict(path)
        for k in t:
            np.testing.assert_array_equal(back[k], t[k])
    with pytest.raises(FileNotFoundError):
        load_torch_state_dict(str(tmp_path))


def test_corrupt_files_fail_loudly(tmp_path):
    p = str(tmp_path / "bad.safetensors")
    t = _tensors()
    save_safetensors(p, t)
    raw = open(p, "rb").read()
    with open(p, "wb") as f:      # truncated header
        f.write(raw[:6])
    with pytest.raises(ValueError):
        load_safetensors(p)
    import json
    import struct

    # out-of-bounds data_offsets must not silently produce garbage
    header = {"x": {"dtype": "F32", "shape": [4],
                    "data_offsets": [0, 1 << 20]}}
    hj = json.dumps(header).encode()
    with open(p, "wb") as f:
        f.write(struct.pack("<Q", len(hj)) + hj + b"\x00" * 16)
    with pytest.raises(ValueError, match="out of bounds"):
        load_safetensors(p)


def test_bert_from_pretrained_safetensors(tmp_path):
    """The full warm-start path (pretrained.py → convert.py) from a
    model.safetensors checkpoint matches the .bin path bit-for-bit."""
    torch = pytest.importorskip("torch")
    import transformers
    from safetensors.torch import save_file

    from bert_multimodal_transformer_tpu.config import (
        BertConfig,
        MultimodalConfig,
    )
    from bert_multimodal_transformer_tpu.utils.pretrained import (
        bert_from_pretrained,
    )

    hf_cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(0)
    tm = transformers.BertModel(hf_cfg).eval()
    d_st = tmp_path / "st"
    d_bin = tmp_path / "bin"
    d_st.mkdir()
    d_bin.mkdir()
    save_file({k: v.contiguous() for k, v in tm.state_dict().items()},
              str(d_st / "model.safetensors"))
    torch.save(tm.state_dict(), d_bin / "pytorch_model.bin")

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0)
    import jax

    _, p_st = bert_from_pretrained(str(d_st), mm, visual_dim=3,
                                   acoustic_dim=5, config=cfg,
                                   num_labels=1, max_seq_length=12)
    _, p_bin = bert_from_pretrained(str(d_bin), mm, visual_dim=3,
                                    acoustic_dim=5, config=cfg,
                                    num_labels=1, max_seq_length=12)
    # every CHECKPOINT-SOURCED leaf identical across formats (MAG and
    # classifier are fresh-init and depend only on the shared seed)
    flat_st = jax.tree_util.tree_leaves_with_path(p_st)
    flat_bin = dict(jax.tree_util.tree_leaves_with_path(p_bin))
    checked = 0
    for path, leaf in flat_st:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_bin[path]))
        checked += 1
    assert checked > 10
