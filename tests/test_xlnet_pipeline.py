"""End-to-end MAG-XLNet path: unigram tokenizer → left-pad packing →
trainer — the XLNet counterpart of the BERT overfit test."""

import numpy as np
import jax
import optax

from bert_multimodal_transformer_tpu.config import (
    MeshConfig,
    MultimodalConfig,
    XLNetConfig,
)
from bert_multimodal_transformer_tpu.data import synthetic
from bert_multimodal_transformer_tpu.data.pipeline import (
    BatchIterator,
    convert_to_features,
)
from bert_multimodal_transformer_tpu.data.tokenization import (
    SimpleUnigramTokenizer,
)
from bert_multimodal_transformer_tpu.models.xlnet import (
    MagXLNetForSequenceClassification,
)
from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
from bert_multimodal_transformer_tpu.training.trainer import Trainer

DV, DA, S, B = 3, 4, 14, 8


def test_xlnet_end_to_end_training_improves():
    tok = SimpleUnigramTokenizer.from_wordlist(synthetic.vocabulary())
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=32, n_dev=8, n_test=8, seed=11)
    split = convert_to_features(data["train"], S, tok, "xlnet",
                                visual_dim=DV, acoustic_dim=DA)
    # left-padded: first column should be mostly PAD for short examples
    assert (split.input_ids[:, 0] == tok.pad_token_id).any()
    # CLS last everywhere
    assert (split.input_ids[:, -1] == tok.vocab["<cls>"]).all()
    assert (split.segment_ids[:, -1] == 2).all()

    cfg = XLNetConfig.tiny(vocab_size=tok.vocab_size)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1,
                          injection_index=1)
    model = MagXLNetForSequenceClassification(
        cfg, mm, visual_dim=DV, acoustic_dim=DA)

    trainer = Trainer(model=model, tx=optax.adam(3e-3),
                      mesh=make_mesh(MeshConfig(data_parallel=1)))
    loader = BatchIterator(split, B, shuffle=True, drop_remainder=True,
                           seed=0)
    sample = next(iter(loader))[0]
    state = trainer.init_state(jax.random.PRNGKey(0), sample)

    losses = []
    for _ in range(15):
        state, loss = state, None
        state, loss = trainer.train_epoch(state, loader)
        losses.append(loss)
    assert losses[-1] < losses[0] / 2, losses

    # data-parallel consistency on the virtual mesh
    trainer_dp = Trainer(model=model, tx=optax.adam(3e-3),
                         mesh=make_mesh(MeshConfig(data_parallel=-1)),
                         donate=False)
    batch = split.take(np.arange(B)).as_tuple()
    s1 = trainer_dp.init_state(jax.random.PRNGKey(0), batch)
    _, l_dp = trainer_dp._train_step(s1, trainer_dp._put_batch(batch))
    assert np.isfinite(float(l_dp))


def test_classifier_surfaces_mems_under_use_cache():
    """Reference surface: the classifier returns (logits,) +
    transformer_outputs[1:] (xlnet.py:510-513) — under use_cache that
    includes the updated mems, so segment recurrence can be driven
    through the classifier head."""
    import dataclasses

    import jax.numpy as jnp

    rng = np.random.RandomState(4)
    cfg = dataclasses.replace(XLNetConfig.tiny(vocab_size=64), mem_len=S)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1,
                          injection_index=1)
    model = MagXLNetForSequenceClassification(cfg, mm, visual_dim=DV,
                                              acoustic_dim=DA)
    ids = jnp.asarray(rng.randint(0, 64, (B, S)), jnp.int32)
    vis = jnp.asarray(rng.randn(B, S, DV), jnp.float32)
    aco = jnp.asarray(rng.randn(B, S, DA), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32)
    seg = jnp.zeros((B, S), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, vis, aco, mask, seg)[
        "params"]

    out = model.apply({"params": params}, ids, vis, aco,
                      attention_mask=mask, token_type_ids=seg,
                      use_cache=True, deterministic=True)
    logits, mems = out[0], out[1]
    assert logits.shape == (B, cfg.num_labels)
    assert len(mems) == cfg.n_layer
    assert mems[0].shape == (B, S, cfg.d_model)

    # second segment consumes the carried mems
    out2 = model.apply({"params": params}, ids, vis, aco,
                       attention_mask=mask, token_type_ids=seg,
                       mems=mems, use_cache=True, deterministic=True)
    assert out2[1][0].shape == (B, S, cfg.d_model)
    assert np.isfinite(np.asarray(out2[0])).all()


def test_xlnet_inputs_embeds_and_head_mask():
    """API parity: inputs_embeds path equals input_ids path; head_mask of
    ones is a no-op, zeros changes the output."""
    import jax.numpy as jnp
    from bert_multimodal_transformer_tpu.models.xlnet import MagXLNetModel

    tok = SimpleUnigramTokenizer.from_wordlist(synthetic.vocabulary())
    cfg = XLNetConfig.tiny(vocab_size=tok.vocab_size)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0,
                          injection_index=1)
    model = MagXLNetModel(cfg, mm, visual_dim=DV, acoustic_dim=DA)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, tok.vocab_size, (2, 9)).astype(np.int32)
    vis = rng.randn(2, 9, DV).astype(np.float32)
    ac = rng.randn(2, 9, DA).astype(np.float32)
    mask = np.ones((2, 9), np.int32)
    segs = np.zeros((2, 9), np.int32)

    vars_ = model.init(jax.random.PRNGKey(0), ids, vis, ac, mask,
                       token_type_ids=segs)
    base, _ = model.apply(vars_, ids, vis, ac, attention_mask=mask,
                          token_type_ids=segs)

    word = np.asarray(
        vars_["params"]["word_embedding"]["embedding"])
    via_embeds, _ = model.apply(vars_, None, vis, ac, attention_mask=mask,
                                token_type_ids=segs,
                                inputs_embeds=jnp.asarray(word[ids]))
    np.testing.assert_allclose(np.asarray(base), np.asarray(via_embeds),
                               rtol=1e-5, atol=1e-6)

    hm1 = np.ones((cfg.n_layer, cfg.n_head), np.float32)
    same, _ = model.apply(vars_, ids, vis, ac, attention_mask=mask,
                          token_type_ids=segs, head_mask=hm1)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same),
                               rtol=1e-6)
    hm0 = np.zeros_like(hm1)
    ablated, _ = model.apply(vars_, ids, vis, ac, attention_mask=mask,
                             token_type_ids=segs, head_mask=hm0)
    assert not np.allclose(np.asarray(base), np.asarray(ablated))


def test_causal_mask_matches_reference_doc():
    """create_mask parity: the documented matrices (reference
    xlnet.py:62-67) for qlen=5, mlen=4."""
    from bert_multimodal_transformer_tpu.models.xlnet import (
        causal_attn_mask,
    )

    got = np.asarray(causal_attn_mask(5, 4, same_length=False))
    want = np.array([
        [0, 0, 0, 0, 0, 1, 1, 1, 1],
        [0, 0, 0, 0, 0, 0, 1, 1, 1],
        [0, 0, 0, 0, 0, 0, 0, 1, 1],
        [0, 0, 0, 0, 0, 0, 0, 0, 1],
        [0, 0, 0, 0, 0, 0, 0, 0, 0]], np.float32)
    np.testing.assert_array_equal(got, want)

    got_sl = np.asarray(causal_attn_mask(5, 4, same_length=True))
    want_sl = np.array([
        [0, 0, 0, 0, 0, 1, 1, 1, 1],
        [1, 0, 0, 0, 0, 0, 1, 1, 1],
        [1, 1, 0, 0, 0, 0, 0, 1, 1],
        [1, 1, 1, 0, 0, 0, 0, 0, 1],
        [1, 1, 1, 1, 0, 0, 0, 0, 0]], np.float32)
    np.testing.assert_array_equal(got_sl, want_sl)


def test_uni_attention_is_causal():
    """attn_type="uni": position i must not see positions > i — changing a
    future token leaves earlier outputs unchanged."""
    import dataclasses
    import jax.numpy as jnp  # noqa: F401

    tok = SimpleUnigramTokenizer.from_wordlist(synthetic.vocabulary())
    cfg = dataclasses.replace(XLNetConfig.tiny(vocab_size=tok.vocab_size),
                              attn_type="uni")
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0,
                          injection_index=99)
    from bert_multimodal_transformer_tpu.models.xlnet import MagXLNetModel
    model = MagXLNetModel(cfg, mm, visual_dim=DV, acoustic_dim=DA)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, tok.vocab_size, (1, 8)).astype(np.int32)
    vis = rng.randn(1, 8, DV).astype(np.float32)
    ac = rng.randn(1, 8, DA).astype(np.float32)
    mask = np.ones((1, 8), np.int32)

    vars_ = model.init(jax.random.PRNGKey(0), ids, vis, ac, mask)
    out1, _ = model.apply(vars_, ids, vis, ac, attention_mask=mask)

    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % tok.vocab_size
    out2, _ = model.apply(vars_, ids2, vis, ac, attention_mask=mask)
    # all positions before the changed one are identical
    np.testing.assert_allclose(np.asarray(out1[0, :-1]),
                               np.asarray(out2[0, :-1]), rtol=1e-5,
                               atol=1e-6)
    assert not np.allclose(np.asarray(out1[0, -1]), np.asarray(out2[0, -1]))


def test_xlnet_remat_matches():
    import jax.numpy as jnp
    from bert_multimodal_transformer_tpu.models.xlnet import (
        MagXLNetForSequenceClassification,
    )

    tok = SimpleUnigramTokenizer.from_wordlist(synthetic.vocabulary())
    cfg = XLNetConfig.tiny(vocab_size=tok.vocab_size)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0,
                          injection_index=1)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, tok.vocab_size, (2, 9)).astype(np.int32)
    vis = rng.randn(2, 9, DV).astype(np.float32)
    ac = rng.randn(2, 9, DA).astype(np.float32)
    mask = np.ones((2, 9), np.int32)

    m0 = MagXLNetForSequenceClassification(cfg, mm, visual_dim=DV,
                                           acoustic_dim=DA, remat=False)
    m1 = MagXLNetForSequenceClassification(cfg, mm, visual_dim=DV,
                                           acoustic_dim=DA, remat=True)
    vars_ = m0.init(jax.random.PRNGKey(0), ids, vis, ac, mask)
    l0 = m0.apply(vars_, ids, vis, ac, attention_mask=mask)
    l1 = m1.apply(vars_, ids, vis, ac, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)

    def loss(p, m):
        return jnp.mean(m.apply({"params": p}, ids, vis, ac,
                                attention_mask=mask) ** 2)

    g0 = jax.grad(lambda p: loss(p, m0))(vars_["params"])
    g1 = jax.grad(lambda p: loss(p, m1))(vars_["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7), g0, g1)


def test_xlnet_packed_qkv_matches_split():
    """The packed [D, 3·H·Dh] q/k/v projection (pack_qkv=True — opt-in,
    measured −3.8% at b256 so split is the default; BENCHMARKS.md) is
    the same per-element math as the three split dots — outputs and
    grads must match (models/xlnet.py)."""
    import dataclasses

    import jax.numpy as jnp
    from bert_multimodal_transformer_tpu.models.xlnet import (
        MagXLNetForSequenceClassification,
    )

    tok = SimpleUnigramTokenizer.from_wordlist(synthetic.vocabulary())
    cfg = dataclasses.replace(XLNetConfig.tiny(vocab_size=tok.vocab_size),
                              pack_qkv=True)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0,
                          injection_index=1)
    rng = np.random.RandomState(3)
    ids = rng.randint(0, tok.vocab_size, (2, 9)).astype(np.int32)
    vis = rng.randn(2, 9, DV).astype(np.float32)
    ac = rng.randn(2, 9, DA).astype(np.float32)
    mask = np.ones((2, 9), np.int32)
    mask[1, :3] = 0  # left-pad

    mp = MagXLNetForSequenceClassification(cfg, mm, visual_dim=DV,
                                           acoustic_dim=DA)
    ms = MagXLNetForSequenceClassification(
        dataclasses.replace(cfg, pack_qkv=False), mm, visual_dim=DV,
        acoustic_dim=DA)
    vars_ = mp.init(jax.random.PRNGKey(0), ids, vis, ac, mask)
    lp = mp.apply(vars_, ids, vis, ac, attention_mask=mask)
    ls = ms.apply(vars_, ids, vis, ac, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls), rtol=1e-6,
                               atol=1e-6)

    def loss(p, m):
        return jnp.mean(m.apply({"params": p}, ids, vis, ac,
                                attention_mask=mask) ** 2)

    gp = jax.grad(lambda p: loss(p, mp))(vars_["params"])
    gs = jax.grad(lambda p: loss(p, ms))(vars_["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), gp, gs)
