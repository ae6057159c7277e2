"""Decompose the MAG-BERT train-step time on the real TPU.

The full jitted step (bench.py) is ~101 ms at bert-base / batch 256 /
seq 50 — ~35% MFU. This tool times surgical variants to attribute the
time: forward vs backward, optimizer, dropout (attention vs hidden),
per-layer slope vs fixed overhead, and raw dispatch latency of the
tunneled backend.

Sync methodology matches bench.py: every variant is a chain where step
i+1 consumes a scalar produced by step i, and the wall clock closes on
``float(jax.device_get(...))`` of the final scalar (block_until_ready
lies on the tunneled backend — CLAUDE.md).

Usage:  python tools/profile_step_breakdown.py            # all variants
        BENCH_BATCH=512 python tools/profile_step_breakdown.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_RNG", "rbg"))
    import jax.numpy as jnp
    import optax

    from bert_multimodal_transformer_tpu.config import (
        BertConfig, MeshConfig, MultimodalConfig)
    from bert_multimodal_transformer_tpu.models.bert import (
        MagBertForSequenceClassification)
    from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
    from bert_multimodal_transformer_tpu.training.losses import mse_loss
    from bert_multimodal_transformer_tpu.training.optim import make_optimizer
    from bert_multimodal_transformer_tpu.training.trainer import Trainer

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    seq = 50
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = 4

    rng = np.random.RandomState(0)
    cfg0 = BertConfig.bert_base_uncased()
    host = dict(
        ids=rng.randint(0, cfg0.vocab_size, (batch, seq)).astype(np.int32),
        vis=rng.randn(batch, seq, 47).astype(np.float32),
        aco=rng.randn(batch, seq, 74).astype(np.float32),
        mask=np.ones((batch, seq), np.int32),
        seg=np.zeros((batch, seq), np.int32),
        lab=rng.uniform(-3, 3, (batch,)).astype(np.float32),
    )
    dev = {k: jnp.asarray(v) for k, v in host.items()}

    def build(cfg_kwargs=None, mag_dropout=0.5):
        import dataclasses as dc
        kw = dict(cfg_kwargs or {})
        cfg = BertConfig.bert_base_uncased()
        if kw:
            cfg = dc.replace(cfg, **kw)
        mm = MultimodalConfig(beta_shift=1.0, dropout_prob=mag_dropout,
                              injection_index=0)
        model = MagBertForSequenceClassification(
            cfg, mm, visual_dim=47, acoustic_dim=74, dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), dev["ids"], dev["vis"],
                            dev["aco"], dev["mask"], dev["seg"])["params"]
        return model, params

    def timed(fn, carry):
        for _ in range(warmup):
            carry = fn(carry)
        _sync(carry)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            carry = fn(carry)
        _sync(carry)
        return (time.perf_counter() - t0) / n_steps * 1e3  # ms

    def _sync(carry):
        leaf = jax.tree_util.tree_leaves(carry)[0]
        np.asarray(jax.device_get(leaf)).ravel()[:1].astype(np.float64)

    results = {}

    def report(name, ms):
        results[name] = ms
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)

    # -- 0. dispatch latency of a trivial chained op ----------------------
    @jax.jit
    def trivial(c):
        return c + 1.0
    report("dispatch_trivial", timed(trivial, jnp.zeros(())))

    # -- 1. full train step (reference point, == bench.py) ----------------
    model, params = build()
    mesh = make_mesh(MeshConfig(data_parallel=len(jax.devices())))
    tx = make_optimizer(learning_rate=1e-5, num_train_steps=10000)
    trainer = Trainer(model=model, tx=tx, mesh=mesh, donate=True)
    batch6 = (host["ids"], host["vis"], host["aco"], host["mask"],
              host["seg"], host["lab"])
    state = trainer.init_state(jax.random.PRNGKey(0), batch6)
    dbatch = trainer._put_batch(batch6)

    def full(state):
        s, _ = trainer._train_step(state, dbatch)
        return s
    report("full_train_step", timed(full, state))
    del state

    # -- helpers for apply-path variants ----------------------------------
    key = jax.random.PRNGKey(7)

    # NOTE: params/batch MUST be jit *arguments*, not closure captures —
    # captured device arrays become HLO constants and the tunneled
    # remote_compile rejects the multi-hundred-MB program (HTTP 413).
    def make_fwd(model, params, deterministic):
        @jax.jit
        def step(p, d, c):
            vis = d["vis"] + c * 1e-30
            kw = {} if deterministic else {"rngs": {"dropout": key}}
            logits = model.apply({"params": p}, d["ids"], vis,
                                 d["aco"], attention_mask=d["mask"],
                                 token_type_ids=d["seg"],
                                 deterministic=deterministic, **kw)
            return mse_loss(logits, d["lab"])
        return lambda c: step(params, dev, c)

    def make_grad(model, params, deterministic):
        def loss_fn(p, d, c):
            vis = d["vis"] + c * 1e-30
            kw = {} if deterministic else {"rngs": {"dropout": key}}
            logits = model.apply({"params": p}, d["ids"], vis,
                                 d["aco"], attention_mask=d["mask"],
                                 token_type_ids=d["seg"],
                                 deterministic=deterministic, **kw)
            return mse_loss(logits, d["lab"])

        @jax.jit
        def step(p, d, c):
            loss, grads = jax.value_and_grad(loss_fn)(p, d, c)
            gsum = jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l).astype(jnp.float32), grads, 0.0)
            return loss + gsum * 1e-30
        return lambda c: step(params, dev, c)

    # -- 2/3. forward only, train vs eval ---------------------------------
    report("fwd_eval_nodrop", timed(make_fwd(model, params, True),
                                    jnp.zeros(())))
    report("fwd_train_drop", timed(make_fwd(model, params, False),
                                   jnp.zeros(())))

    # -- 4/5. fwd+bwd, dropout on/off --------------------------------------
    report("grad_train_drop", timed(make_grad(model, params, False),
                                    jnp.zeros(())))
    report("grad_nodrop", timed(make_grad(model, params, True),
                                jnp.zeros(())))

    # -- 6/7. isolate attention-prob vs hidden dropout ---------------------
    m_noattn, p_noattn = build({"attention_probs_dropout_prob": 0.0})
    report("grad_drop_no_attnprob",
           timed(make_grad(m_noattn, p_noattn, False), jnp.zeros(())))
    m_nohid, p_nohid = build({"hidden_dropout_prob": 0.0}, mag_dropout=0.0)
    report("grad_drop_only_attnprob",
           timed(make_grad(m_nohid, p_nohid, False), jnp.zeros(())))

    # -- 8. layer-count slope: 6 layers ------------------------------------
    m6, p6 = build({"num_hidden_layers": 6})
    report("grad_train_drop_6layer",
           timed(make_grad(m6, p6, False), jnp.zeros(())))

    # -- 9. optimizer-only --------------------------------------------------
    opt_state = tx.init(params)

    @jax.jit
    def opt_step(carry):
        p, s = carry
        g = jax.tree_util.tree_map(lambda x: x * 1e-8, p)
        updates, s = tx.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s)
    report("optimizer_only", timed(opt_step, (params, opt_state)))

    # -- derived ------------------------------------------------------------
    der = {
        "bwd_est_ms": results["grad_train_drop"] - results["fwd_train_drop"],
        "attnprob_dropout_cost_ms":
            results["grad_train_drop"] - results["grad_drop_no_attnprob"],
        "all_dropout_cost_ms":
            results["grad_train_drop"] - results["grad_nodrop"],
        "per_layer_ms":
            (results["grad_train_drop"] - results["grad_train_drop_6layer"])
            / 6.0,
        "fixed_overhead_ms":
            results["grad_train_drop_6layer"] * 2
            - results["grad_train_drop"],
        "opt_plus_dispatch_ms":
            results["optimizer_only"],
        "step_minus_grad_ms":
            results["full_train_step"] - results["grad_train_drop"],
    }
    print(json.dumps({"derived": {k: round(v, 2) for k, v in der.items()}},
                     indent=2))


if __name__ == "__main__":
    main()
