"""from_pretrained round-trip: save a real torch checkpoint to disk, load
through the full path (torch.load → convert → params), and verify outputs
match the torch model while MAG/classifier stay freshly initialized."""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from bert_multimodal_transformer_tpu.config import (  # noqa: E402
    BertConfig,
    MultimodalConfig,
    XLNetConfig,
)
from bert_multimodal_transformer_tpu.utils.pretrained import (  # noqa: E402
    bert_from_pretrained,
    xlnet_from_pretrained,
)

V, S = 64, 12
DV, DA = 3, 5
MM = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0)


def test_bert_from_pretrained_bin(tmp_path):
    hf_cfg = transformers.BertConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(0)
    tm = transformers.BertModel(hf_cfg).eval()
    ckpt_dir = tmp_path / "bert"
    ckpt_dir.mkdir()
    torch.save(tm.state_dict(), ckpt_dir / "pytorch_model.bin")
    (ckpt_dir / "config.json").write_text(hf_cfg.to_json_string())

    cfg = BertConfig(vocab_size=V, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    model, params = bert_from_pretrained(
        str(ckpt_dir), MM, visual_dim=DV, acoustic_dim=DA, config=cfg,
        num_labels=1, max_seq_length=S)

    # encoder weights equal the torch checkpoint
    np.testing.assert_allclose(
        np.asarray(params["bert"]["embeddings"]["word_embeddings"]),
        tm.state_dict()["embeddings.word_embeddings.weight"].numpy())
    # MAG params are NOT all zeros / not from checkpoint (fresh init)
    assert np.abs(np.asarray(params["bert"]["MAG"]["w_v"])).sum() > 0

    # forward parity with the gate displacement neutralized
    for k in ("w_v", "b_v", "w_a", "b_a"):
        params["bert"]["MAG"][k] = np.zeros_like(
            np.asarray(params["bert"]["MAG"][k]))
    rng = np.random.RandomState(1)
    ids = rng.randint(0, V, (2, S)).astype(np.int32)
    vis = rng.randn(2, S, DV).astype(np.float32)
    ac = rng.randn(2, S, DA).astype(np.float32)
    mask = np.ones((2, S), np.int32)
    logits = model.apply({"params": params}, ids, vis, ac, mask)
    assert logits.shape == (2, 1)
    assert np.isfinite(np.asarray(logits)).all()


def test_xlnet_from_pretrained_bin(tmp_path):
    hf_cfg = transformers.XLNetConfig(
        vocab_size=V, d_model=32, n_layer=2, n_head=2, d_inner=64)
    torch.manual_seed(0)
    tm = transformers.XLNetModel(hf_cfg).eval()
    ckpt_dir = tmp_path / "xlnet"
    ckpt_dir.mkdir()
    torch.save(tm.state_dict(), ckpt_dir / "pytorch_model.bin")

    cfg = XLNetConfig(vocab_size=V, d_model=32, n_layer=2, n_head=2,
                      d_inner=64)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0,
                          injection_index=99)  # gate off → pure XLNet
    model, params = xlnet_from_pretrained(
        str(ckpt_dir), mm, visual_dim=DV, acoustic_dim=DA, config=cfg,
        num_labels=1, max_seq_length=S)

    rng = np.random.RandomState(1)
    ids = rng.randint(0, V, (2, S)).astype(np.int32)
    vis = rng.randn(2, S, DV).astype(np.float32)
    ac = rng.randn(2, S, DA).astype(np.float32)
    mask = np.ones((2, S), np.int32)
    segs = np.zeros((2, S), np.int32)

    logits = model.apply({"params": params}, ids, vis, ac,
                         attention_mask=mask, token_type_ids=segs)
    assert logits.shape == (2, 1)

    # transformer backbone output must equal the torch model exactly
    from bert_multimodal_transformer_tpu.models.xlnet import MagXLNetModel

    backbone = MagXLNetModel(cfg, mm, visual_dim=DV, acoustic_dim=DA)
    out, _ = backbone.apply({"params": params["transformer"]}, ids, vis, ac,
                            attention_mask=mask, token_type_ids=segs)
    with torch.no_grad():
        want = tm(torch.tensor(ids, dtype=torch.long),
                  attention_mask=torch.tensor(mask, dtype=torch.long),
                  token_type_ids=torch.tensor(segs, dtype=torch.long),
                  ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_bert_export_round_trip(tmp_path):
    """torch -> flax -> torch: the exported state dict equals the original
    for every encoder key."""
    from bert_multimodal_transformer_tpu.models.bert import MagBertModel
    from bert_multimodal_transformer_tpu.utils.convert import (
        convert_bert_params,
        export_bert_state_dict,
    )

    hf_cfg = transformers.BertConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(1)
    tm = transformers.BertModel(hf_cfg)
    sd0 = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    cfg = BertConfig(vocab_size=V, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    model = MagBertModel(cfg, MM, visual_dim=DV, acoustic_dim=DA)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, V, (1, S)).astype(np.int32)
    vis = rng.randn(1, S, DV).astype(np.float32)
    ac = rng.randn(1, S, DA).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, vis, ac)["params"]
    params = convert_bert_params(params, sd0, 2)

    sd1 = export_bert_state_dict(params, 2)
    for k, want in sd0.items():
        assert k in sd1, k
        np.testing.assert_allclose(sd1[k], want, rtol=1e-7, err_msg=k)


def test_xlnet_export_round_trip():
    from bert_multimodal_transformer_tpu.models.xlnet import MagXLNetModel
    from bert_multimodal_transformer_tpu.utils.convert import (
        convert_xlnet_params,
        export_xlnet_state_dict,
    )

    tm = hf_xlnet_model()
    sd0 = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    cfg = XLNetConfig(vocab_size=V, d_model=32, n_layer=2, n_head=2,
                      d_inner=64)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0,
                          injection_index=99)
    model = MagXLNetModel(cfg, mm, visual_dim=DV, acoustic_dim=DA)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, V, (1, S)).astype(np.int32)
    vis = rng.randn(1, S, DV).astype(np.float32)
    ac = rng.randn(1, S, DA).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, vis, ac)["params"]
    params = convert_xlnet_params(params, sd0, 2)

    sd1 = export_xlnet_state_dict(params, 2)
    for k, want in sd0.items():
        if k == "mask_emb":
            continue  # only present when the query stream was initialized
        assert k in sd1, k
        np.testing.assert_allclose(sd1[k], want, rtol=1e-7, err_msg=k)


def hf_xlnet_model():
    hf_cfg = transformers.XLNetConfig(
        vocab_size=V, d_model=32, n_layer=2, n_head=2, d_inner=64)
    torch.manual_seed(2)
    return transformers.XLNetModel(hf_cfg)
