"""A/B: adamw_hf (HF-exact) vs optax.adamw step time at bench geometry."""
import sys
import time

import numpy as np
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_default_prng_impl", "rbg")

    import dataclasses

    from bert_multimodal_transformer_tpu.config import (
        BertConfig, MeshConfig, MultimodalConfig)
    from bert_multimodal_transformer_tpu.models.bert import (
        MagBertForSequenceClassification)
    from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
    from bert_multimodal_transformer_tpu.training.optim import (
        adamw_hf, decay_mask, linear_warmup_decay_schedule, make_optimizer)
    from bert_multimodal_transformer_tpu.training.trainer import Trainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    seq = 50
    cfg = dataclasses.replace(BertConfig.bert_base_uncased(),
                              attention_impl="fused")
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=47,
                                             acoustic_dim=74,
                                             dtype=jnp.bfloat16)
    mesh = make_mesh(MeshConfig(data_parallel=1), devices=jax.devices()[:1])
    rng = np.random.RandomState(0)
    b = (rng.randint(0, cfg.vocab_size, (batch, seq)).astype(np.int32),
         rng.randn(batch, seq, 47).astype(np.float32),
         rng.randn(batch, seq, 74).astype(np.float32),
         np.ones((batch, seq), np.int32),
         np.zeros((batch, seq), np.int32),
         rng.uniform(-3, 3, (batch,)).astype(np.float32))

    sched = linear_warmup_decay_schedule(1e-5, 1000, 10000)
    variants = {
        "adamw_hf": adamw_hf(sched, weight_decay=0.01, mask=decay_mask),
        "optax.adamw": optax.adamw(learning_rate=sched, b1=0.9, b2=0.999,
                                   eps=1e-6, weight_decay=0.01,
                                   mask=decay_mask),
    }
    for name, tx in variants.items():
        tr = Trainer(model=model, tx=tx, mesh=mesh, donate=True)
        st = tr.init_state(jax.random.PRNGKey(0), b)
        db = tr._put_batch(b)
        for _ in range(5):
            st, loss = tr._train_step(st, db)
        float(jax.device_get(loss))
        t0 = time.monotonic()
        for _ in range(20):
            st, loss = tr._train_step(st, db)
        float(jax.device_get(loss))
        ms = (time.monotonic() - t0) / 20 * 1e3
        print(f"{name}: {ms:.2f} ms/step ({batch/ms*1e3:.0f} ex/s)")


if __name__ == "__main__":
    main()
