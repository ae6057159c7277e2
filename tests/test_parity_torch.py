"""Golden parity tests against HF transformers (torch, CPU).

The reference's model math lives in transformers==3.0.2 (SURVEY §2b); the
locally installed transformers 4.57 implements the same BERT/XLNet math, so
randomly-initialized torch models serve as the golden oracle. These tests
simultaneously validate the model forward math AND the torch→flax weight
converters (utils/convert.py). Dropout off everywhere (eval mode).
"""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from bert_multimodal_transformer_tpu.config import (  # noqa: E402
    BertConfig,
    MultimodalConfig,
    XLNetConfig,
)
from bert_multimodal_transformer_tpu.models.bert import (  # noqa: E402
    BertEmbeddings,
    BertEncoder,
    MagBertModel,
)
from bert_multimodal_transformer_tpu.models.xlnet import (  # noqa: E402
    MagXLNetForSequenceClassification,
    MagXLNetModel,
)
from bert_multimodal_transformer_tpu.ops.attention import (  # noqa: E402
    extended_attention_mask,
)
from bert_multimodal_transformer_tpu.utils.convert import (  # noqa: E402
    convert_bert_params,
    convert_xlnet_params,
)

B, S, V = 2, 10, 64
DV, DA = 3, 5

BCFG = BertConfig(vocab_size=V, hidden_size=32, num_hidden_layers=2,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=64)
XCFG = XLNetConfig(vocab_size=V, d_model=32, n_layer=2, n_head=2, d_inner=64)


def hf_bert():
    cfg = transformers.BertConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_act="gelu",
        attn_implementation="eager")
    torch.manual_seed(0)
    return transformers.BertModel(cfg).eval()


def hf_xlnet(mem_len=None):
    cfg = transformers.XLNetConfig(
        vocab_size=V, d_model=32, n_layer=2, n_head=2, d_inner=64,
        mem_len=mem_len, attn_type="bi", bi_data=False, clamp_len=-1)
    torch.manual_seed(0)
    return transformers.XLNetModel(cfg).eval()


def inputs(seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, V, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[:, 7:] = 0
    segs = np.zeros((B, S), np.int32)
    segs[:, 5:] = 1
    return ids, mask, segs


def sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


# --------------------------------------------------------------------------
# BERT
# --------------------------------------------------------------------------

class TestBertParity:
    @pytest.fixture(scope="class")
    def torch_model(self):
        return hf_bert()

    def test_embeddings(self, torch_model):
        ids, _, segs = inputs()
        mod = BertEmbeddings(BCFG)
        variables = mod.init(jax.random.PRNGKey(0), jnp.array(ids),
                             jnp.array(segs))
        # map torch embeddings into flax tree
        sd = sd_numpy(torch_model)
        p = jax.device_get(variables["params"])
        p["word_embeddings"] = sd["embeddings.word_embeddings.weight"]
        p["position_embeddings"] = sd["embeddings.position_embeddings.weight"]
        p["token_type_embeddings"] = sd[
            "embeddings.token_type_embeddings.weight"]
        p["LayerNorm"]["scale"] = sd["embeddings.LayerNorm.weight"]
        p["LayerNorm"]["bias"] = sd["embeddings.LayerNorm.bias"]
        got = mod.apply({"params": p}, jnp.array(ids), jnp.array(segs))
        with torch.no_grad():
            want = torch_model.embeddings(
                torch.tensor(ids, dtype=torch.long),
                token_type_ids=torch.tensor(segs, dtype=torch.long)).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-5)

    def test_full_model_via_converter(self, torch_model):
        """MagBertModel with converter-loaded weights vs the SAME pipeline
        assembled from HF torch modules, with the MAG displacement zeroed
        (H_m = 0 → α·H_m = 0 → gate output = MAG-LayerNorm(emb)). The MAG
        LayerNorm is applied analytically on the torch side (fp64 numpy,
        eps 1e-5, unit γ / zero β) instead of being absorbed into a loose
        tolerance, so this is an exact-math full-pipeline comparison."""
        ids, mask, segs = inputs()
        mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0)
        model = MagBertModel(BCFG, mm, visual_dim=DV, acoustic_dim=DA)
        rng = np.random.RandomState(1)
        vis = rng.randn(B, S, DV).astype(np.float32)
        ac = rng.randn(B, S, DA).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), ids, vis, ac, mask,
                               segs)
        params = jax.device_get(variables["params"])
        params = convert_bert_params(params, sd_numpy(torch_model),
                                     BCFG.num_hidden_layers)
        # neutralize the MAG displacement (visual/acoustic cannot leak in)
        for k in ("w_v", "b_v", "w_a", "b_a"):
            params["MAG"][k] = np.zeros_like(params["MAG"][k])

        seq, pooled = model.apply({"params": params}, ids, vis, ac, mask,
                                  segs)
        with torch.no_grad():
            emb = torch_model.embeddings(
                torch.tensor(ids, dtype=torch.long),
                token_type_ids=torch.tensor(segs, dtype=torch.long)).numpy()
            # the gate's LayerNorm with H_m = 0 (torch-default eps 1e-5,
            # fresh unit γ / zero β — modeling.py:22,45-49), in fp64
            x = emb.astype(np.float64)
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            fused = ((x - mu) / np.sqrt(var + 1e-5)).astype(np.float32)
            ext = (1.0 - torch.tensor(mask, dtype=torch.float32)) * -10000.0
            want_seq = torch_model.encoder(
                torch.tensor(fused),
                attention_mask=ext[:, None, None, :]).last_hidden_state
            want_pooled = torch_model.pooler(want_seq)
        np.testing.assert_allclose(np.asarray(seq), want_seq.numpy(),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pooled), want_pooled.numpy(),
                                   rtol=1e-3, atol=1e-5)

    def test_encoder_exact(self, torch_model):
        """Encoder stack parity given identical inputs — exact to fp32."""
        rng = np.random.RandomState(2)
        hidden = rng.randn(B, S, 32).astype(np.float32)
        _, mask, _ = inputs()

        mod = BertEncoder(BCFG)
        bias = extended_attention_mask(jnp.array(mask))
        variables = mod.init(jax.random.PRNGKey(0), jnp.array(hidden), bias)
        params = jax.device_get(variables["params"])
        # The converter expects the full tree; wrap the encoder params with a
        # dummy embeddings subtree it can fill from the torch state dict.
        sd = sd_numpy(torch_model)
        full = {"embeddings": {
            "word_embeddings": sd["embeddings.word_embeddings.weight"],
            "position_embeddings": sd[
                "embeddings.position_embeddings.weight"],
            "token_type_embeddings": sd[
                "embeddings.token_type_embeddings.weight"],
            "LayerNorm": {"scale": sd["embeddings.LayerNorm.weight"],
                          "bias": sd["embeddings.LayerNorm.bias"]}},
            "encoder": params}
        full = convert_bert_params(full, sd, BCFG.num_hidden_layers)
        got = mod.apply({"params": full["encoder"]}, jnp.array(hidden), bias)

        ext = (1.0 - torch.tensor(mask, dtype=torch.float32)) * -10000.0
        ext = ext[:, None, None, :]
        with torch.no_grad():
            want = torch_model.encoder(
                torch.tensor(hidden), attention_mask=ext
            ).last_hidden_state.numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-5)


# --------------------------------------------------------------------------
# XLNet
# --------------------------------------------------------------------------

def make_mag_xlnet(mem_len=None, injection_index=99):
    """injection_index=99 > n_layer disables the gate → pure XLNet."""
    cfg = XLNetConfig(vocab_size=V, d_model=32, n_layer=2, n_head=2,
                      d_inner=64, mem_len=mem_len)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0,
                          injection_index=injection_index)
    return MagXLNetModel(cfg, mm, visual_dim=DV, acoustic_dim=DA), cfg


class TestXLNetParity:
    @pytest.fixture(scope="class")
    def torch_model(self):
        return hf_xlnet()

    def _converted_params(self, model, torch_model, ids, vis, ac, mask,
                          segs, **kw):
        variables = model.init(jax.random.PRNGKey(0), ids, vis, ac, mask,
                               token_type_ids=segs, **kw)
        params = jax.device_get(variables["params"])
        return convert_xlnet_params(params, sd_numpy(torch_model),
                                    XCFG.n_layer)

    def test_content_stream_parity(self, torch_model):
        ids, mask, segs = inputs()
        rng = np.random.RandomState(1)
        vis = rng.randn(B, S, DV).astype(np.float32)
        ac = rng.randn(B, S, DA).astype(np.float32)
        model, _ = make_mag_xlnet()
        params = self._converted_params(model, torch_model, ids, vis, ac,
                                        mask, segs)
        got, _ = model.apply({"params": params}, ids, vis, ac,
                             attention_mask=mask, token_type_ids=segs)
        with torch.no_grad():
            want = torch_model(
                torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
                token_type_ids=torch.tensor(segs, dtype=torch.long),
            ).last_hidden_state.numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-4)

    def test_two_stream_parity(self, torch_model):
        """Query stream with target_mapping + perm_mask — the full
        two-stream path (xlnet.py:300-313, 374-385)."""
        ids, mask, segs = inputs()
        rng = np.random.RandomState(2)
        vis = rng.randn(B, S, DV).astype(np.float32)
        ac = rng.randn(B, S, DA).astype(np.float32)
        M = 3
        tmap = np.zeros((B, M, S), np.float32)
        for b in range(B):
            for m in range(M):
                tmap[b, m, 2 * m] = 1.0
        perm = rng.rand(B, S, S).round().astype(np.float32)

        model, _ = make_mag_xlnet()
        params = self._converted_params(
            model, torch_model, ids, vis, ac, mask, segs,
            perm_mask=perm, target_mapping=tmap)
        # copy mask_emb from torch
        sd = sd_numpy(torch_model)
        params["mask_emb"] = sd["mask_emb"].reshape(
            params["mask_emb"].shape)
        got, _ = model.apply({"params": params}, ids, vis, ac,
                             attention_mask=mask, token_type_ids=segs,
                             perm_mask=perm, target_mapping=tmap)
        with torch.no_grad():
            want = torch_model(
                torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
                token_type_ids=torch.tensor(segs, dtype=torch.long),
                perm_mask=torch.tensor(perm),
                target_mapping=torch.tensor(tmap),
            ).last_hidden_state.numpy()
        assert got.shape == (B, M, 32)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-4)

    def test_mems_parity(self):
        """Segment recurrence: two chunks with mems carried between them
        (xlnet.py:81-91,363-365)."""
        torch_model = hf_xlnet(mem_len=S)
        ids1, mask1, segs1 = inputs(0)
        ids2, _, segs2 = inputs(3)
        mask1[:] = 1  # full-length chunks for the mems path
        rng = np.random.RandomState(4)
        vis = rng.randn(B, S, DV).astype(np.float32)
        ac = rng.randn(B, S, DA).astype(np.float32)

        model, _ = make_mag_xlnet(mem_len=S)
        params = self._converted_params(model, torch_model, ids1, vis, ac,
                                        mask1, segs1, use_cache=True)
        out1, mems = model.apply({"params": params}, ids1, vis, ac,
                                 attention_mask=mask1, token_type_ids=segs1,
                                 use_cache=True)
        assert mems is not None and len(mems) == XCFG.n_layer
        out2, _ = model.apply({"params": params}, ids2, vis, ac,
                              attention_mask=mask1, token_type_ids=segs2,
                              mems=mems, use_cache=True)
        with torch.no_grad():
            t1 = torch_model(
                torch.tensor(ids1, dtype=torch.long),
                attention_mask=torch.tensor(mask1, dtype=torch.long),
                token_type_ids=torch.tensor(segs1, dtype=torch.long),
                use_mems=True)
            t2 = torch_model(
                torch.tensor(ids2, dtype=torch.long),
                attention_mask=torch.tensor(mask1, dtype=torch.long),
                token_type_ids=torch.tensor(segs2, dtype=torch.long),
                mems=t1.mems, use_mems=True)
        np.testing.assert_allclose(np.asarray(out1),
                                   t1.last_hidden_state.numpy(),
                                   rtol=1e-4, atol=1e-4)
        # torch mems are time-first [M, B, D]; ours batch-first [B, M, D]
        for ours, theirs in zip(mems, t1.mems):
            np.testing.assert_allclose(
                np.asarray(ours), theirs.permute(1, 0, 2).numpy(),
                rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out2),
                                   t2.last_hidden_state.numpy(),
                                   rtol=1e-4, atol=1e-4)


class TestXLNetForwardSurface:
    """The XLNet forward-surface corners: bi_data positional streams
    (reference xlnet.py:126-141), uni/causal attention with same_length
    (create_mask, xlnet.py:51-79), and the output_hidden_states /
    output_attentions tuples (xlnet.py:401-429)."""

    def _run_pair(self, hf_kwargs, our_cfg_kwargs, call_kwargs=None,
                  torch_kwargs=None, pass_mask=True):
        cfg = transformers.XLNetConfig(
            vocab_size=V, d_model=32, n_layer=2, n_head=2, d_inner=64,
            mem_len=None, **hf_kwargs)
        torch.manual_seed(0)
        tm = transformers.XLNetModel(cfg).eval()

        ids, mask, segs = inputs()
        if not pass_mask:
            mask = None
        rng = np.random.RandomState(1)
        vis = rng.randn(B, S, DV).astype(np.float32)
        ac = rng.randn(B, S, DA).astype(np.float32)

        ocfg = XLNetConfig(vocab_size=V, d_model=32, n_layer=2, n_head=2,
                           d_inner=64, **our_cfg_kwargs)
        mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0,
                              injection_index=99)
        model = MagXLNetModel(ocfg, mm, visual_dim=DV, acoustic_dim=DA)
        variables = model.init(jax.random.PRNGKey(0), ids, vis, ac, mask,
                               token_type_ids=segs)
        params = convert_xlnet_params(
            jax.device_get(variables["params"]), sd_numpy(tm), 2)
        got = model.apply({"params": params}, ids, vis, ac,
                          attention_mask=mask, token_type_ids=segs,
                          **(call_kwargs or {}))
        tmask = (torch.tensor(mask, dtype=torch.long)
                 if mask is not None else None)
        with torch.no_grad():
            want = tm(torch.tensor(ids, dtype=torch.long),
                      attention_mask=tmask,
                      token_type_ids=torch.tensor(segs, dtype=torch.long),
                      **(torch_kwargs or {}))
        return got, want

    def test_bi_data_parity(self):
        """bi_data=True: first half of the batch reads forward positions,
        second half backward (xlnet.py:126-141)."""
        got, want = self._run_pair({"attn_type": "bi", "bi_data": True,
                                    "clamp_len": -1},
                                   {"bi_data": True})
        np.testing.assert_allclose(np.asarray(got[0]),
                                   want.last_hidden_state.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_bi_data_differs_from_uni_streams(self):
        """Sanity: bi_data actually changes the second batch half."""
        got_bi, _ = self._run_pair({"bi_data": True}, {"bi_data": True})
        got_no, _ = self._run_pair({"bi_data": False}, {"bi_data": False})
        a, b_ = np.asarray(got_bi[0]), np.asarray(got_no[0])
        # fwd half bitwise identical (same position stream); bwd half
        # reads negated positions — a small but real perturbation at this
        # tiny random-init scale (HF shows the same magnitude).
        assert np.array_equal(a[: B // 2], b_[: B // 2])
        assert np.abs(a[B // 2:] - b_[B // 2:]).max() > 1e-6

    def test_bi_data_odd_batch_raises(self):
        ocfg = XLNetConfig(vocab_size=V, d_model=32, n_layer=2, n_head=2,
                           d_inner=64, bi_data=True)
        mm = MultimodalConfig(1.0, 0.0, injection_index=99)
        model = MagXLNetModel(ocfg, mm, visual_dim=DV, acoustic_dim=DA)
        rng = np.random.RandomState(0)
        with pytest.raises(ValueError, match="even batch"):
            model.init(jax.random.PRNGKey(0),
                       rng.randint(0, V, (3, S)).astype(np.int32),
                       rng.randn(3, S, DV).astype(np.float32),
                       rng.randn(3, S, DA).astype(np.float32),
                       np.ones((3, S), np.int32))

    @pytest.mark.parametrize("same_length", [False, True])
    def test_uni_attention_parity(self, same_length):
        """attn_type='uni' causal masking incl. the same_length variant
        (reference create_mask, xlnet.py:51-79). No padding mask: HF 4.57's
        uni path crashes combining a batched input mask with the causal
        mask (in-place broadcast bug), so the oracle only covers the
        unpadded case; the padded combination is covered by
        test_uni_causal_mask_algebra below."""
        got, want = self._run_pair(
            {"attn_type": "uni", "same_length": same_length},
            {"attn_type": "uni", "same_length": same_length},
            pass_mask=False)
        np.testing.assert_allclose(np.asarray(got[0]),
                                   want.last_hidden_state.numpy(),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("same_length", [False, True])
    @pytest.mark.parametrize("mlen", [0, 4])
    def test_uni_causal_mask_algebra(self, same_length, mlen):
        """causal_attn_mask matches an independent numpy transcription of
        the reference create_mask (xlnet.py:51-79)."""
        from bert_multimodal_transformer_tpu.models.xlnet import (
            causal_attn_mask)

        qlen = 6
        got = np.asarray(causal_attn_mask(qlen, mlen, same_length))
        # literal numpy transcription of create_mask (xlnet.py:51-79):
        # future (strict upper triangle) masked; same_length additionally
        # adds the strict lower triangle onto the first qlen COLUMNS
        # (spanning the mems pad region when mlen > 0).
        ones = np.ones((qlen, qlen), np.float32)
        want = np.concatenate(
            [np.zeros((qlen, mlen), np.float32), np.triu(ones, k=1)], axis=1)
        if same_length:
            want = np.concatenate(
                [want[:, :qlen] + np.tril(ones, k=-1), want[:, qlen:]],
                axis=1)
        np.testing.assert_array_equal(got, want)

    def test_output_hidden_states_and_attentions_parity(self):
        got, want = self._run_pair(
            {}, {},
            call_kwargs={"output_hidden_states": True,
                         "output_attentions": True},
            torch_kwargs={"output_hidden_states": True,
                          "output_attentions": True})
        output, _mems, hiddens, attns = got
        assert len(hiddens) == 3 and len(attns) == 2
        for ours, theirs in zip(hiddens, want.hidden_states):
            np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                       rtol=1e-4, atol=1e-4)
        for ours, theirs in zip(attns, want.attentions):
            np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                       rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(output),
                                   want.last_hidden_state.numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_bert_output_hidden_states_and_attentions_parity():
    """BERT extras tuples (reference surfaces encoder extras at
    bert.py:233-237) against HF torch."""
    torch_model = hf_bert()
    ids, mask, segs = inputs()
    rng = np.random.RandomState(1)
    vis = rng.randn(B, S, DV).astype(np.float32)
    ac = rng.randn(B, S, DA).astype(np.float32)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0)
    model = MagBertModel(BCFG, mm, visual_dim=DV, acoustic_dim=DA)
    variables = model.init(jax.random.PRNGKey(0), ids, vis, ac, mask, segs)
    params = convert_bert_params(jax.device_get(variables["params"]),
                                 sd_numpy(torch_model),
                                 BCFG.num_hidden_layers)
    for k in ("w_v", "b_v", "w_a", "b_a"):  # neutralize MAG displacement
        params["MAG"][k] = np.zeros_like(params["MAG"][k])
    seq, pooled, hiddens, attns = model.apply(
        {"params": params}, ids, vis, ac, mask, segs,
        output_hidden_states=True, output_attentions=True)
    with torch.no_grad():
        want = torch_model(
            torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(segs, dtype=torch.long),
            output_hidden_states=True, output_attentions=True)
    assert len(hiddens) == BCFG.num_hidden_layers + 1
    assert len(attns) == BCFG.num_hidden_layers
    # hiddens[0] differs (MAG LayerNorm on the embedding output) but the
    # attention probs and later hiddens must track HF within the
    # documented MAG-LN tolerance.
    for ours, theirs in zip(attns, want.attentions):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(hiddens[-1]),
                               want.hidden_states[-1].numpy(),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(seq),
                               want.last_hidden_state.numpy(),
                               rtol=0.05, atol=0.05)


def test_mag_xlnet_classifier_end_to_end_shapes():
    """Smoke: the full MAG-XLNet classifier with the gate active at layer 1
    (global_configs.py:19) produces finite logits and gradients."""
    ids, mask, segs = inputs()
    rng = np.random.RandomState(5)
    vis = rng.randn(B, S, DV).astype(np.float32)
    ac = rng.randn(B, S, DA).astype(np.float32)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1,
                          injection_index=1)
    model = MagXLNetForSequenceClassification(
        XCFG, mm, visual_dim=DV, acoustic_dim=DA)
    variables = model.init(jax.random.PRNGKey(0), ids, vis, ac, mask,
                           token_type_ids=segs)
    logits = model.apply(variables, ids, vis, ac, attention_mask=mask,
                         token_type_ids=segs)
    assert logits.shape == (B, 1)
    assert np.isfinite(np.asarray(logits)).all()

    def loss_fn(p):
        lg = model.apply({"params": p}, ids, vis, ac, attention_mask=mask,
                         token_type_ids=segs)
        return jnp.mean(lg ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(g)).all(), path
