"""Shape/semantics tests for the Flax MAG-BERT stack."""

import numpy as np
import jax
import jax.numpy as jnp

from bert_multimodal_transformer_tpu.config import BertConfig, MultimodalConfig
from bert_multimodal_transformer_tpu.models.bert import (
    BertEmbeddings,
    MagBertForSequenceClassification,
    MagBertModel,
)
from bert_multimodal_transformer_tpu.ops.attention import (
    extended_attention_mask,
)

CFG = BertConfig.tiny()
MM = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
DV, DA = 5, 7
B, S = 2, 10


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, CFG.vocab_size, (B, S)).astype(np.int32)
    visual = rng.randn(B, S, DV).astype(np.float32)
    acoustic = rng.randn(B, S, DA).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    mask[:, 7:] = 0
    return ids, visual, acoustic, mask


def test_extended_attention_mask_values():
    mask = jnp.array([[1, 1, 0]])
    got = np.asarray(extended_attention_mask(mask))
    assert got.shape == (1, 1, 1, 3)
    np.testing.assert_allclose(got[0, 0, 0], [0.0, 0.0, -10000.0])


def test_embeddings_shape():
    ids, *_ = make_inputs()
    mod = BertEmbeddings(CFG)
    vars_ = mod.init(jax.random.PRNGKey(0), jnp.array(ids),
                     jnp.zeros_like(ids))
    out = mod.apply(vars_, jnp.array(ids), jnp.zeros_like(ids))
    assert out.shape == (B, S, CFG.hidden_size)


def test_mag_bert_model_outputs():
    ids, visual, acoustic, mask = make_inputs()
    model = MagBertModel(CFG, MM, visual_dim=DV, acoustic_dim=DA)
    vars_ = model.init(jax.random.PRNGKey(0), ids, visual, acoustic, mask)
    seq, pooled = model.apply(vars_, ids, visual, acoustic, mask)
    assert seq.shape == (B, S, CFG.hidden_size)
    assert pooled.shape == (B, CFG.hidden_size)
    assert np.isfinite(np.asarray(seq)).all()
    # pooler is tanh-bounded
    assert np.abs(np.asarray(pooled)).max() <= 1.0


def test_classifier_logits_and_padding_invariance():
    """Padded positions must not influence the pooled logits: changing token
    ids under mask=0 leaves logits unchanged (extended-mask semantics,
    reference bert.py:180-182)."""
    ids, visual, acoustic, mask = make_inputs()
    model = MagBertForSequenceClassification(
        CFG, MM, visual_dim=DV, acoustic_dim=DA)
    vars_ = model.init(jax.random.PRNGKey(0), ids, visual, acoustic, mask)
    logits1 = model.apply(vars_, ids, visual, acoustic, mask)
    assert logits1.shape == (B, CFG.num_labels)

    ids2 = ids.copy()
    ids2[:, 7:] = (ids2[:, 7:] + 13) % CFG.vocab_size
    logits2 = model.apply(vars_, ids2, visual, acoustic, mask)
    # Note: padded *modality* rows are zeros in the real pipeline; MAG mixes
    # them positionwise only, so padded-position changes stay masked out of
    # attention. Token-id change under mask affects only the padded rows'
    # own hidden states, never attended-to content or the [CLS] pool.
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               rtol=1e-5, atol=1e-6)


def test_train_mode_is_stochastic():
    ids, visual, acoustic, mask = make_inputs()
    model = MagBertForSequenceClassification(
        CFG, MM, visual_dim=DV, acoustic_dim=DA)
    vars_ = model.init(jax.random.PRNGKey(0), ids, visual, acoustic, mask)
    l1 = model.apply(vars_, ids, visual, acoustic, mask,
                     deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    l2 = model.apply(vars_, ids, visual, acoustic, mask,
                     deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_grads_flow_to_all_params():
    ids, visual, acoustic, mask = make_inputs()
    model = MagBertForSequenceClassification(
        CFG, MM, visual_dim=DV, acoustic_dim=DA)
    vars_ = model.init(jax.random.PRNGKey(0), ids, visual, acoustic, mask)

    def loss_fn(params):
        logits = model.apply({"params": params}, ids, visual, acoustic, mask)
        return jnp.mean(logits ** 2)

    grads = jax.grad(loss_fn)(vars_["params"])
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    n_nonzero = 0
    for path, g in leaves:
        assert np.isfinite(np.asarray(g)).all(), path
        if np.abs(np.asarray(g)).sum() > 0:
            n_nonzero += 1
    # Nearly every parameter should receive gradient (word embeddings for
    # unused ids are legitimately zero-row).
    assert n_nonzero >= len(leaves) - 1


def test_bf16_forward_matches_fp32_loosely():
    ids, visual, acoustic, mask = make_inputs()
    m32 = MagBertForSequenceClassification(
        CFG, MM, visual_dim=DV, acoustic_dim=DA, dtype=jnp.float32)
    m16 = MagBertForSequenceClassification(
        CFG, MM, visual_dim=DV, acoustic_dim=DA, dtype=jnp.bfloat16)
    vars_ = m32.init(jax.random.PRNGKey(0), ids, visual, acoustic, mask)
    l32 = np.asarray(m32.apply(vars_, ids, visual, acoustic, mask))
    l16 = np.asarray(m16.apply(vars_, ids, visual, acoustic, mask))
    np.testing.assert_allclose(l16, l32, rtol=0.1, atol=0.1)


def test_head_mask_and_inputs_embeds():
    """HF-parity API surface: head_mask zeroes heads; inputs_embeds replaces
    input_ids (reference bert.py:114-115,208-209)."""
    ids, visual, acoustic, mask = make_inputs()
    model = MagBertForSequenceClassification(
        CFG, MM, visual_dim=DV, acoustic_dim=DA)
    vars_ = model.init(jax.random.PRNGKey(0), ids, visual, acoustic, mask)

    base = model.apply(vars_, ids, visual, acoustic, mask)
    hm = np.ones((CFG.num_hidden_layers, CFG.num_attention_heads),
                 np.float32)
    same = model.apply(vars_, ids, visual, acoustic, mask, head_mask=hm)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same),
                               rtol=1e-6)
    hm0 = np.zeros_like(hm)
    ablated = model.apply(vars_, ids, visual, acoustic, mask, head_mask=hm0)
    assert not np.allclose(np.asarray(base), np.asarray(ablated))

    # inputs_embeds path: feeding the word embeddings directly must match
    word = np.asarray(vars_["params"]["bert"]["embeddings"]
                      ["word_embeddings"])
    embeds = word[ids]
    via_embeds = model.apply(vars_, None, visual, acoustic, mask,
                             inputs_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(base), np.asarray(via_embeds),
                               rtol=1e-5, atol=1e-6)


def test_remat_forward_matches():
    """remat=True must be numerically identical to remat=False."""
    ids, visual, acoustic, mask = make_inputs()
    m0 = MagBertForSequenceClassification(
        CFG, MM, visual_dim=DV, acoustic_dim=DA, remat=False)
    m1 = MagBertForSequenceClassification(
        CFG, MM, visual_dim=DV, acoustic_dim=DA, remat=True)
    vars_ = m0.init(jax.random.PRNGKey(0), ids, visual, acoustic, mask)
    l0 = m0.apply(vars_, ids, visual, acoustic, mask)
    l1 = m1.apply(vars_, ids, visual, acoustic, mask)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)

    def loss(p, m):
        return jnp.mean(m.apply({"params": p}, ids, visual, acoustic,
                                mask) ** 2)

    g0 = jax.grad(lambda p: loss(p, m0))(vars_["params"])
    g1 = jax.grad(lambda p: loss(p, m1))(vars_["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7), g0, g1)


def test_labels_path_returns_loss_and_logits():
    """reference contract: labels given -> (loss, logits) with the
    MSE/CE switch (bert.py:313-322)."""
    ids, visual, acoustic, mask = make_inputs()
    model = MagBertForSequenceClassification(
        CFG, MM, visual_dim=DV, acoustic_dim=DA)
    vars_ = model.init(jax.random.PRNGKey(0), ids, visual, acoustic, mask)
    labels = np.linspace(-2, 2, B).astype(np.float32)
    loss, logits = model.apply(vars_, ids, visual, acoustic, mask,
                               labels=labels)
    plain = model.apply(vars_, ids, visual, acoustic, mask)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(plain))
    want = np.mean((np.asarray(plain).reshape(-1) - labels) ** 2)
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)


def test_flash_attention_matches_einsum():
    """Flash backend (Pallas kernel, interpret mode on CPU) must match the
    einsum path on real-token positions; pad rows are excluded (SegmentIds
    vs additive-mask padding semantics differ only there)."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu

    S_f = 128  # flash kernel block size minimum
    cfg_e = dataclasses.replace(BertConfig.tiny(), attention_impl="einsum",
                                max_position_embeddings=S_f,
                                attention_probs_dropout_prob=0.0)
    cfg_f = dataclasses.replace(cfg_e, attention_impl="flash")
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg_e.vocab_size, (2, S_f)).astype(np.int32)
    visual = rng.randn(2, S_f, DV).astype(np.float32)
    acoustic = rng.randn(2, S_f, DA).astype(np.float32)
    mask = np.ones((2, S_f), np.int32)
    mask[:, 100:] = 0

    m_e = MagBertModel(cfg_e, MM, visual_dim=DV, acoustic_dim=DA)
    m_f = MagBertModel(cfg_f, MM, visual_dim=DV, acoustic_dim=DA)
    vars_ = m_e.init(jax.random.PRNGKey(0), ids, visual, acoustic, mask)
    seq_e, pooled_e = m_e.apply(vars_, ids, visual, acoustic, mask)
    with pltpu.force_tpu_interpret_mode():
        seq_f, pooled_f = m_f.apply(vars_, ids, visual, acoustic, mask)
    np.testing.assert_allclose(np.asarray(seq_f[:, :100]),
                               np.asarray(seq_e[:, :100]),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled_f), np.asarray(pooled_e),
                               rtol=2e-2, atol=2e-3)


def test_fused_attention_fits_predicate():
    """Scoped-VMEM fit predicate behind the fused kernels' long-seq
    fallback (ops/fused_attention.py::fused_attention_fits): production
    geometries fit, the measured S=512 compile-OOM geometry does not."""
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_attention_fits,
    )

    assert fused_attention_fits(12, 50, 768)        # bert-base
    assert fused_attention_fits(16, 50, 1024)       # bert-large
    assert fused_attention_fits(12, 128, 768)
    # S=512 b32 eval: 20.41 MB stack allocation vs the 16 MB scoped
    # limit (BENCHMARKS.md "Long-sequence scaling")
    assert not fused_attention_fits(12, 512, 768)


def test_fused_falls_back_beyond_vmem_fit(monkeypatch):
    """attention_impl='fused' at a geometry the short-seq kernels cannot
    compile must degrade (flash here: dropout-free) instead of emitting
    the kernel — outputs match einsum on real-token positions."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu

    # shrink the planning budget so the tiny test geometry "doesn't fit"
    monkeypatch.setenv("FUSED_ATTN_VMEM_BUDGET", "1")

    S_f = 128
    cfg_e = dataclasses.replace(BertConfig.tiny(), attention_impl="einsum",
                                max_position_embeddings=S_f,
                                attention_probs_dropout_prob=0.0)
    cfg_fu = dataclasses.replace(cfg_e, attention_impl="fused")
    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg_e.vocab_size, (2, S_f)).astype(np.int32)
    visual = rng.randn(2, S_f, DV).astype(np.float32)
    acoustic = rng.randn(2, S_f, DA).astype(np.float32)
    mask = np.ones((2, S_f), np.int32)
    mask[:, 100:] = 0

    m_e = MagBertModel(cfg_e, MM, visual_dim=DV, acoustic_dim=DA)
    m_fu = MagBertModel(cfg_fu, MM, visual_dim=DV, acoustic_dim=DA)
    vars_ = m_e.init(jax.random.PRNGKey(0), ids, visual, acoustic, mask)
    seq_e, pooled_e = m_e.apply(vars_, ids, visual, acoustic, mask)
    with pltpu.force_tpu_interpret_mode():
        seq_fu, pooled_fu = m_fu.apply(vars_, ids, visual, acoustic, mask)
    np.testing.assert_allclose(np.asarray(seq_fu[:, :100]),
                               np.asarray(seq_e[:, :100]),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled_fu),
                               np.asarray(pooled_e), rtol=2e-2, atol=2e-3)
