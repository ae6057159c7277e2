"""Diagnose the optimizer copy-done cost (NOTES_ROUND1 lever).

Builds the bench train step (bert-base, b256, fused attention), compiles
it, and reports:
  * whether donated TrainState buffers actually alias input→output
    (compiled HLO input_output_alias coverage over params/mu/nu leaves);
  * the count/bytes of copy/copy-start ops in the optimized HLO;
  * measured step time with donation ON vs OFF (the delta IS the copy
    cost if aliasing is what the copies are about).

Run on the TPU (no env forcing). Usage:
    python tools/exp_optimizer_copydone.py [batch]
"""

import re
import sys
import time

import numpy as np
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from bert_multimodal_transformer_tpu.config import (
        BertConfig,
        MeshConfig,
        MultimodalConfig,
    )
    from bert_multimodal_transformer_tpu.models.bert import (
        MagBertForSequenceClassification,
    )
    from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
    from bert_multimodal_transformer_tpu.training.optim import make_optimizer
    from bert_multimodal_transformer_tpu.training.trainer import Trainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    seq = 50
    import dataclasses
    cfg = dataclasses.replace(BertConfig.bert_base_uncased(),
                              attention_impl="fused")
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=47,
                                             acoustic_dim=74,
                                             dtype=jnp.bfloat16)
    mesh = make_mesh(MeshConfig(data_parallel=1),
                     devices=jax.devices()[:1])
    rng = np.random.RandomState(0)
    b = (rng.randint(0, cfg.vocab_size, (batch, seq)).astype(np.int32),
         rng.randn(batch, seq, 47).astype(np.float32),
         rng.randn(batch, seq, 74).astype(np.float32),
         np.ones((batch, seq), np.int32),
         np.zeros((batch, seq), np.int32),
         rng.uniform(-3, 3, (batch,)).astype(np.float32))

    def timed(trainer, state, steps=20, warm=5):
        db = trainer._put_batch(b)
        for _ in range(warm):
            state, loss = trainer._train_step(state, db)
        float(jax.device_get(loss))
        t0 = time.monotonic()
        for _ in range(steps):
            state, loss = trainer._train_step(state, db)
        float(jax.device_get(loss))
        return (time.monotonic() - t0) / steps * 1e3

    for donate in (True, False):
        tx = make_optimizer(learning_rate=1e-5, num_train_steps=10000)
        tr = Trainer(model=model, tx=tx, mesh=mesh, donate=donate)
        st = tr.init_state(jax.random.PRNGKey(0), b)
        if donate:
            compiled = tr._train_step.lower(st, tr._put_batch(b)).compile()
            txt = compiled.as_text()
            aliases = re.findall(r"input_output_alias\s*=\s*\{([^}]*)\}",
                                 txt)
            alias_entries = (aliases[0].count("(") if aliases else 0)
            copies = len(re.findall(r"\bcopy\(", txt))
            copy_starts = len(re.findall(r"copy-start", txt))
            n_leaves = len(jax.tree_util.tree_leaves(st))
            print(f"[donate] HLO alias entries: {alias_entries} "
                  f"(state leaves: {n_leaves}); copy ops: {copies}, "
                  f"copy-start: {copy_starts}")
        ms = timed(tr, st)
        print(f"donate={donate}: {ms:.2f} ms/step "
              f"({batch / ms * 1e3:.0f} ex/s)")


if __name__ == "__main__":
    main()
