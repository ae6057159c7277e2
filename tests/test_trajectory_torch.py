"""Step-for-step training-trajectory equivalence vs a torch twin.

The strongest real-data-parity proxy available offline (no MOSI pickles,
no HF hub): build the reference training stack in actual torch — HF
BertModel + the reference MAG gate (modeling.py:6-51) + classifier head,
the reference's AdamW with its two param groups and linear
warmup→decay schedule (multimodal_driver.py:311-351), external MSE loss
(:371-373) — transplant its init into the Flax trainer, feed IDENTICAL
batches to both, and assert ~20 consecutive fp32 loss values and the final
parameters agree to numerical noise. This validates loss + grads +
optimizer + schedule + decay-mask semantics end to end.

Dropout is 0 everywhere (the only nondeterminism in the reference loop).
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from bert_multimodal_transformer_tpu.config import (  # noqa: E402
    BertConfig,
    MeshConfig,
    MultimodalConfig,
)
from bert_multimodal_transformer_tpu.models.bert import (  # noqa: E402
    MagBertForSequenceClassification,
)
from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh  # noqa: E402
from bert_multimodal_transformer_tpu.training.optim import (  # noqa: E402
    make_optimizer,
)
from bert_multimodal_transformer_tpu.training.trainer import (  # noqa: E402
    Trainer,
)
from bert_multimodal_transformer_tpu.utils.convert import (  # noqa: E402
    convert_bert_params,
)
from test_mag import _TorchRefMAG  # noqa: E402

B, S, V = 8, 16, 64
D, DV, DA = 32, 3, 5
LR, WD, N_STEPS, WARMUP_PROP = 1e-3, 0.01, 20, 0.1
NO_DECAY = ("bias", "LayerNorm.bias", "LayerNorm.weight")


class _TorchTwin:
    """The reference MAG_BertForSequenceClassification assembled in torch
    (bert.py:240-324): HF embeddings → MAG → encoder → pooler →
    classifier. All dropout probabilities zero."""

    def __init__(self):
        cfg = transformers.BertConfig(
            vocab_size=V, hidden_size=D, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, hidden_act="gelu",
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            attn_implementation="eager")
        torch.manual_seed(0)
        self.bert = transformers.BertModel(cfg)
        self.mag = _TorchRefMAG(D, DV, DA, beta_shift=1.0)
        torch.manual_seed(1)
        self.classifier = torch.nn.Linear(D, 1)

    def named_parameters(self):
        yield from self.bert.named_parameters()
        for prefix, mod in (("MAG.W_hv", self.mag.W_hv),
                            ("MAG.W_ha", self.mag.W_ha),
                            ("MAG.W_v", self.mag.W_v),
                            ("MAG.W_a", self.mag.W_a),
                            ("MAG.LayerNorm", self.mag.LayerNorm),
                            ("classifier", self.classifier)):
            for n, p in mod.named_parameters():
                yield f"{prefix}.{n}", p

    def forward(self, ids, vis, ac, mask, segs):
        emb = self.bert.embeddings(input_ids=ids, token_type_ids=segs)
        fused = self.mag(emb, vis, ac)
        ext = (1.0 - mask.float())[:, None, None, :] * -10000.0
        seq = self.bert.encoder(fused,
                                attention_mask=ext).last_hidden_state
        pooled = self.bert.pooler(seq)
        return self.classifier(pooled)


def _hf_schedule_mult(completed, warmup, total):
    """HF get_linear_schedule_with_warmup λ, indexed by COMPLETED updates
    (scheduler.step() runs after optimizer.step(),
    multimodal_driver.py:383-386)."""
    if completed < warmup:
        return completed / max(1, warmup)
    return max(0.0, (total - completed) / max(1, total - warmup))


def _hf_adamw_step(named_params, opt_state, lr):
    """One update of the reference optimizer (transformers-3.0.2 AdamW):
    m/v EMAs, denom = sqrt(v)+eps BEFORE bias correction, step size
    lr·sqrt(1−β₂ᵗ)/(1−β₁ᵗ), decoupled weight decay applied to the
    post-update parameter; no-decay groups per multimodal_driver.py:328-343.
    """
    b1, b2, eps = 0.9, 0.999, 1e-6
    with torch.no_grad():
        for name, p in named_params:
            g = p.grad
            if g is None:  # params unused by the graph (e.g. XLNet
                continue   # mask_emb without a query stream) — HF AdamW
                           # skips them too (p.grad is None check)
            st = opt_state.setdefault(
                name, {"step": 0, "m": torch.zeros_like(p),
                       "v": torch.zeros_like(p)})
            st["step"] += 1
            st["m"].mul_(b1).add_(g, alpha=1 - b1)
            st["v"].mul_(b2).addcmul_(g, g, value=1 - b2)
            denom = st["v"].sqrt().add(eps)
            step_size = (lr * math.sqrt(1 - b2 ** st["step"])
                         / (1 - b1 ** st["step"]))
            p.addcdiv_(st["m"], denom, value=-step_size)
            if not any(nd in name for nd in NO_DECAY):
                p.add_(p, alpha=-lr * WD)


def _transplant(twin, flax_params):
    """Torch twin init → Flax param tree (encoder via convert_bert_params;
    MAG through the split-param mapping ops/mag.py:64-68; classifier)."""
    sd = {k: v.detach().numpy() for k, v in twin.bert.state_dict().items()}
    params = convert_bert_params(jax.device_get(flax_params), sd, 2)

    mag = params["bert"]["MAG"]
    w_hv = twin.mag.W_hv.weight.detach().numpy().T  # [DV+D, D]
    w_ha = twin.mag.W_ha.weight.detach().numpy().T  # [DA+D, D]
    mag["w_hv_v"], mag["w_hv_t"] = w_hv[:DV], w_hv[DV:]
    mag["b_hv"] = twin.mag.W_hv.bias.detach().numpy()
    mag["w_ha_a"], mag["w_ha_t"] = w_ha[:DA], w_ha[DA:]
    mag["b_ha"] = twin.mag.W_ha.bias.detach().numpy()
    mag["w_v"] = twin.mag.W_v.weight.detach().numpy().T
    mag["b_v"] = twin.mag.W_v.bias.detach().numpy()
    mag["w_a"] = twin.mag.W_a.weight.detach().numpy().T
    mag["b_a"] = twin.mag.W_a.bias.detach().numpy()
    mag["ln_gamma"] = twin.mag.LayerNorm.weight.detach().numpy()
    mag["ln_beta"] = twin.mag.LayerNorm.bias.detach().numpy()

    params["classifier"]["kernel"] = \
        twin.classifier.weight.detach().numpy().T
    params["classifier"]["bias"] = twin.classifier.bias.detach().numpy()
    return params


def _batches(n):
    rng = np.random.RandomState(42)
    out = []
    for _ in range(n):
        ids = rng.randint(0, V, (B, S)).astype(np.int32)
        vis = rng.randn(B, S, DV).astype(np.float32)
        ac = rng.randn(B, S, DA).astype(np.float32)
        mask = np.ones((B, S), np.int32)
        mask[:, 12:] = 0
        segs = np.zeros((B, S), np.int32)
        labels = rng.uniform(-3, 3, (B,)).astype(np.float32)
        out.append((ids, vis, ac, mask, segs, labels))
    return out


def test_training_trajectory_matches_torch():
    batches = _batches(N_STEPS)
    warmup = int(WARMUP_PROP * N_STEPS)

    # ---- torch twin trajectory -------------------------------------------
    twin = _TorchTwin()
    mse = torch.nn.MSELoss()
    opt_state = {}
    torch_losses = []
    for k, (ids, vis, ac, mask, segs, labels) in enumerate(batches):
        logits = twin.forward(
            torch.tensor(ids, dtype=torch.long), torch.tensor(vis),
            torch.tensor(ac), torch.tensor(mask, dtype=torch.long),
            torch.tensor(segs, dtype=torch.long))
        loss = mse(logits.view(-1), torch.tensor(labels).view(-1))
        for _, p in twin.named_parameters():
            if p.grad is not None:
                p.grad = None
        loss.backward()
        lr = LR * _hf_schedule_mult(k, warmup, N_STEPS)
        _hf_adamw_step(list(twin.named_parameters()), opt_state, lr)
        torch_losses.append(float(loss.detach()))

    # ---- flax trajectory (same init, same batches) -----------------------
    cfg = BertConfig(vocab_size=V, hidden_size=D, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                             acoustic_dim=DA)
    ids, vis, ac, mask, segs, _ = batches[0]
    variables = model.init(jax.random.PRNGKey(0), ids, vis, ac, mask, segs)

    twin_fresh = _TorchTwin()  # untouched init (twin above was trained)
    params = _transplant(twin_fresh, variables["params"])

    mesh = make_mesh(MeshConfig(data_parallel=1),
                     devices=jax.devices()[:1])
    tx = make_optimizer(learning_rate=LR, num_train_steps=N_STEPS,
                        warmup_proportion=WARMUP_PROP, weight_decay=WD)
    trainer = Trainer(model=model, tx=tx, mesh=mesh, donate=False)
    state = trainer.create_state_from_params(
        jax.tree_util.tree_map(jnp.asarray, params), jax.random.PRNGKey(1))

    jax_losses = []
    for batch in batches:
        state, loss = trainer._train_step(state, trainer._put_batch(batch))
        jax_losses.append(float(jax.device_get(loss)))

    # ---- equivalence ------------------------------------------------------
    # Early steps agree to ~1e-6 relative; the drift grows to a few 1e-4
    # by step 20 purely from fp32 summation-order differences (XLA:CPU vs
    # torch's oneDNN, which itself warns its computation order perturbs
    # round-off). rtol 1e-3 is far below any semantic divergence (a wrong
    # eps placement or decay group shifts losses by >1e-2 here).
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3,
                               atol=1e-6)
    # Trajectories must MOVE for this to be meaningful.
    assert abs(torch_losses[0] - torch_losses[-1]) > 1e-3

    # Final parameters agree (spot-check a decayed matrix, a no-decay
    # LayerNorm, a MAG weight, and the classifier).
    final = jax.device_get(state.params)
    twin_sd = dict(twin.named_parameters())

    def close(a, b, **kw):
        np.testing.assert_allclose(a, np.asarray(b.detach()), **kw)

    close(final["bert"]["encoder"]["layer_0"]["intermediate_dense"]
          ["kernel"], twin_sd["encoder.layer.0.intermediate.dense.weight"].T,
          rtol=1e-3, atol=5e-5)
    close(final["bert"]["embeddings"]["LayerNorm"]["scale"],
          twin_sd["embeddings.LayerNorm.weight"], rtol=1e-3, atol=5e-5)
    close(final["bert"]["MAG"]["w_v"], twin_sd["MAG.W_v.weight"].T,
          rtol=1e-3, atol=5e-5)
    close(final["classifier"]["kernel"], twin_sd["classifier.weight"].T,
          rtol=1e-3, atol=5e-5)


# ---------------------------------------------------------------------------
# XLNet twin
# ---------------------------------------------------------------------------


class _TorchXLNetTwin:
    """The reference MAG_XLNetForSequenceClassification assembled in torch
    (xlnet.py:432-527): HF XLNetModel with the reference MAG gate injected
    before layer 1 (xlnet.py:371-372, XLNET_INJECTION_INDEX=1 at
    global_configs.py:19) via a forward pre-hook on the layer (the hidden
    stream is time-first there, like the reference's transposed layout,
    xlnet.py:206-239), then last-token SequenceSummary (proj+tanh) and
    logits projection. All dropout zero."""

    def __init__(self):
        cfg = transformers.XLNetConfig(
            vocab_size=V, d_model=D, n_layer=2, n_head=2, d_inner=64,
            dropout=0.0, mem_len=None, attn_type="bi", bi_data=False,
            clamp_len=-1, same_length=False)
        torch.manual_seed(0)
        self.xlnet = transformers.XLNetModel(cfg).eval()
        self.mag = _TorchRefMAG(D, DV, DA, beta_shift=1.0)
        torch.manual_seed(1)
        self.summary = torch.nn.Linear(D, D)
        self.logits_proj = torch.nn.Linear(D, 1)
        self._modal = {}

        def hook(module, args):
            # args[0] is output_h, [S, B, D] (time-first); the gate is
            # last-dim-wise so it applies unchanged (xlnet.py:371-372).
            return (self.mag(args[0], self._modal["vis"],
                             self._modal["ac"]),) + args[1:]

        self.xlnet.layer[1].register_forward_pre_hook(hook)

    def named_parameters(self):
        yield from self.xlnet.named_parameters()
        for prefix, mod in (("MAG.W_hv", self.mag.W_hv),
                            ("MAG.W_ha", self.mag.W_ha),
                            ("MAG.W_v", self.mag.W_v),
                            ("MAG.W_a", self.mag.W_a),
                            ("MAG.LayerNorm", self.mag.LayerNorm),
                            ("sequence_summary.summary", self.summary),
                            ("logits_proj", self.logits_proj)):
            for n, p in mod.named_parameters():
                yield f"{prefix}.{n}", p

    def forward(self, ids, vis, ac, mask, segs):
        self._modal["vis"] = vis.transpose(0, 1)
        self._modal["ac"] = ac.transpose(0, 1)
        out = self.xlnet(input_ids=ids, attention_mask=mask,
                         token_type_ids=segs).last_hidden_state  # [B,S,D]
        summary = torch.tanh(self.summary(out[:, -1]))
        return self.logits_proj(summary)


def _xlnet_batches(n):
    """Left-padded XLNet-packed batches (multimodal_driver.py:176-205):
    CLS last (segment 2), left pads with mask 0 / segment 3."""
    rng = np.random.RandomState(43)
    out = []
    for _ in range(n):
        ids = rng.randint(0, V, (B, S)).astype(np.int32)
        vis = rng.randn(B, S, DV).astype(np.float32)
        ac = rng.randn(B, S, DA).astype(np.float32)
        mask = np.ones((B, S), np.int32)
        segs = np.zeros((B, S), np.int32)
        segs[:, -1] = 2
        pads = rng.randint(0, 5, (B,))
        for i, p in enumerate(pads):
            mask[i, :p] = 0
            segs[i, :p] = 3
        labels = rng.uniform(-3, 3, (B,)).astype(np.float32)
        out.append((ids, vis, ac, mask, segs, labels))
    return out


def _transplant_xlnet(twin, flax_params):
    from bert_multimodal_transformer_tpu.utils.convert import (
        convert_xlnet_params,
    )

    sd = {k: v.detach().numpy() for k, v in twin.xlnet.state_dict().items()}
    params = convert_xlnet_params(jax.device_get(flax_params), sd, 2)

    mag = params["transformer"]["MAG"]
    w_hv = twin.mag.W_hv.weight.detach().numpy().T  # [DV+D, D]
    w_ha = twin.mag.W_ha.weight.detach().numpy().T  # [DA+D, D]
    mag["w_hv_v"], mag["w_hv_t"] = w_hv[:DV], w_hv[DV:]
    mag["b_hv"] = twin.mag.W_hv.bias.detach().numpy()
    mag["w_ha_a"], mag["w_ha_t"] = w_ha[:DA], w_ha[DA:]
    mag["b_ha"] = twin.mag.W_ha.bias.detach().numpy()
    mag["w_v"] = twin.mag.W_v.weight.detach().numpy().T
    mag["b_v"] = twin.mag.W_v.bias.detach().numpy()
    mag["w_a"] = twin.mag.W_a.weight.detach().numpy().T
    mag["b_a"] = twin.mag.W_a.bias.detach().numpy()
    mag["ln_gamma"] = twin.mag.LayerNorm.weight.detach().numpy()
    mag["ln_beta"] = twin.mag.LayerNorm.bias.detach().numpy()

    params["sequence_summary"]["summary"]["kernel"] = \
        twin.summary.weight.detach().numpy().T
    params["sequence_summary"]["summary"]["bias"] = \
        twin.summary.bias.detach().numpy()
    params["logits_proj"]["kernel"] = \
        twin.logits_proj.weight.detach().numpy().T
    params["logits_proj"]["bias"] = twin.logits_proj.bias.detach().numpy()
    return params


def test_xlnet_training_trajectory_matches_torch():
    """Same harness as the BERT trajectory test, for the XLNet family:
    reference stack (HF XLNet + MAG@layer1 + SequenceSummary head +
    HF AdamW/groups/schedule) vs the Flax trainer, identical init and
    batches, ~20 fp32 losses and final params must agree."""
    from bert_multimodal_transformer_tpu.config import XLNetConfig
    from bert_multimodal_transformer_tpu.models.xlnet import (
        MagXLNetForSequenceClassification,
    )

    batches = _xlnet_batches(N_STEPS)
    warmup = int(WARMUP_PROP * N_STEPS)

    # ---- torch twin trajectory -------------------------------------------
    twin = _TorchXLNetTwin()
    mse = torch.nn.MSELoss()
    opt_state = {}
    torch_losses = []
    for k, (ids, vis, ac, mask, segs, labels) in enumerate(batches):
        logits = twin.forward(
            torch.tensor(ids, dtype=torch.long), torch.tensor(vis),
            torch.tensor(ac), torch.tensor(mask, dtype=torch.float32),
            torch.tensor(segs, dtype=torch.long))
        loss = mse(logits.view(-1), torch.tensor(labels).view(-1))
        for _, p in twin.named_parameters():
            if p.grad is not None:
                p.grad = None
        loss.backward()
        lr = LR * _hf_schedule_mult(k, warmup, N_STEPS)
        _hf_adamw_step(list(twin.named_parameters()), opt_state, lr)
        torch_losses.append(float(loss.detach()))

    # ---- flax trajectory (same init, same batches) -----------------------
    cfg = XLNetConfig(vocab_size=V, d_model=D, n_layer=2, n_head=2,
                      d_inner=64, dropout=0.0, summary_last_dropout=0.0)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0,
                          injection_index=1)
    model = MagXLNetForSequenceClassification(cfg, mm, visual_dim=DV,
                                              acoustic_dim=DA)
    ids, vis, ac, mask, segs, _ = batches[0]
    variables = model.init(jax.random.PRNGKey(0), ids, vis, ac,
                           mask.astype(np.float32), segs)

    twin_fresh = _TorchXLNetTwin()
    params = _transplant_xlnet(twin_fresh, variables["params"])

    mesh = make_mesh(MeshConfig(data_parallel=1),
                     devices=jax.devices()[:1])
    tx = make_optimizer(learning_rate=LR, num_train_steps=N_STEPS,
                        warmup_proportion=WARMUP_PROP, weight_decay=WD)
    trainer = Trainer(model=model, tx=tx, mesh=mesh, donate=False)
    state = trainer.create_state_from_params(
        jax.tree_util.tree_map(jnp.asarray, params), jax.random.PRNGKey(1))

    jax_losses = []
    for batch in batches:
        state, loss = trainer._train_step(state, trainer._put_batch(batch))
        jax_losses.append(float(jax.device_get(loss)))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3,
                               atol=1e-6)
    assert abs(torch_losses[0] - torch_losses[-1]) > 1e-3

    final = jax.device_get(state.params)
    twin_sd = dict(twin.named_parameters())

    def close(a, b, **kw):
        np.testing.assert_allclose(a, np.asarray(b.detach()), **kw)

    # a decayed einsum weight, a no-decay rel bias, a MAG weight, the head
    close(final["transformer"]["layer_0"]["rel_attn"]["q"].reshape(D, -1),
          twin_sd["layer.0.rel_attn.q"].reshape(D, -1),
          rtol=1e-3, atol=5e-5)
    close(final["transformer"]["layer_0"]["rel_attn"]["r_w_bias"].reshape(-1),
          twin_sd["layer.0.rel_attn.r_w_bias"].reshape(-1),
          rtol=1e-3, atol=5e-5)
    close(final["transformer"]["MAG"]["w_v"], twin_sd["MAG.W_v.weight"].T,
          rtol=1e-3, atol=5e-5)
    close(final["logits_proj"]["kernel"], twin_sd["logits_proj.weight"].T,
          rtol=1e-3, atol=5e-5)


def test_decay_mask_matches_reference_groups():
    """The optax decay mask classifies every MagBert param exactly like the
    reference's two param groups (multimodal_driver.py:328-343) classify
    the torch twin's named params."""
    from bert_multimodal_transformer_tpu.training.optim import decay_mask

    cfg = BertConfig(vocab_size=V, hidden_size=D, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                             acoustic_dim=DA)
    rng = np.random.RandomState(0)
    variables = model.init(
        jax.random.PRNGKey(0), rng.randint(0, V, (2, S)).astype(np.int32),
        rng.randn(2, S, DV).astype(np.float32),
        rng.randn(2, S, DA).astype(np.float32),
        np.ones((2, S), np.int32), np.zeros((2, S), np.int32))
    mask = decay_mask(variables["params"])

    twin = _TorchTwin()
    torch_decay = {n: not any(nd in n for nd in NO_DECAY)
                   for n, _ in twin.named_parameters()}

    flax_to_torch = {
        ("bert", "embeddings", "word_embeddings"):
            "embeddings.word_embeddings.weight",
        ("bert", "embeddings", "LayerNorm", "scale"):
            "embeddings.LayerNorm.weight",
        ("bert", "embeddings", "LayerNorm", "bias"):
            "embeddings.LayerNorm.bias",
        ("bert", "encoder", "layer_0", "attention", "qkv", "kernel"):
            "encoder.layer.0.attention.self.query.weight",
        ("bert", "encoder", "layer_0", "attention", "qkv", "bias"):
            "encoder.layer.0.attention.self.query.bias",
        ("bert", "encoder", "layer_0", "output_LayerNorm", "scale"):
            "encoder.layer.0.output.LayerNorm.weight",
        ("bert", "MAG", "w_hv_v"): "MAG.W_hv.weight",
        ("bert", "MAG", "b_hv"): "MAG.W_hv.bias",
        ("bert", "MAG", "ln_gamma"): "MAG.LayerNorm.weight",
        ("bert", "MAG", "ln_beta"): "MAG.LayerNorm.bias",
        ("bert", "pooler", "dense", "kernel"): "pooler.dense.weight",
        ("bert", "pooler", "dense", "bias"): "pooler.dense.bias",
        ("classifier", "kernel"): "classifier.weight",
        ("classifier", "bias"): "classifier.bias",
    }
    for path, torch_name in flax_to_torch.items():
        node = mask
        for k in path:
            node = node[k]
        assert node == torch_decay[torch_name], (path, torch_name)
