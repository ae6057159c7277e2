"""Capture a jax.profiler trace of the MAG-BERT train step on TPU.

Answers the MFU question in NOTES_ROUND1 #4: where do the ~100 ms/step at
bert-base batch-256 go (matmuls vs elementwise vs tunnel overhead)?

Usage: python tools/profile_train_step.py [trace_dir] [batch]
Writes a TensorBoard-loadable trace under trace_dir (default
/tmp/mag_trace); inspect with `tensorboard --logdir`.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp

    # Share the persistent compilation cache with bench.py/driver so a
    # trace stage and its matching bench config compile once per session.
    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
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
    from bert_multimodal_transformer_tpu.utils.profiling import trace

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mag_trace"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    if os.environ.get("BENCH_MODEL", "bert") == "xlnet":
        from bert_multimodal_transformer_tpu.config import XLNetConfig
        from bert_multimodal_transformer_tpu.models.xlnet import (
            MagXLNetForSequenceClassification)
        cfg = XLNetConfig.xlnet_base_cased()
        attn = os.environ.get("BENCH_ATTN", "fused")  # match bench.py
        if attn != "einsum":
            import dataclasses
            cfg = dataclasses.replace(cfg, attention_impl=attn)
        model = MagXLNetForSequenceClassification(
            cfg, MultimodalConfig(1.0, 0.5, injection_index=1),
            visual_dim=47, acoustic_dim=74, dtype=jnp.bfloat16)
    else:
        cfg = (BertConfig.bert_large_uncased()
               if os.environ.get("BENCH_MODEL") == "bert-large"
               else BertConfig.bert_base_uncased())
        attn = os.environ.get("BENCH_ATTN", "fused")  # match bench.py
        if attn != "einsum":
            import dataclasses
            cfg = dataclasses.replace(cfg, attention_impl=attn)
        model = MagBertForSequenceClassification(
            cfg, MultimodalConfig(1.0, 0.5), visual_dim=47,
            acoustic_dim=74, dtype=jnp.bfloat16)
    trainer = Trainer(model=model, tx=make_optimizer(1e-5, 10000),
                      mesh=make_mesh(MeshConfig(data_parallel=1)),
                      donate=True)

    rng = np.random.RandomState(0)
    S = 50
    hb = (rng.randint(0, cfg.vocab_size, (batch, S)).astype(np.int32),
          rng.randn(batch, S, 47).astype(np.float32),
          rng.randn(batch, S, 74).astype(np.float32),
          np.ones((batch, S), np.int32),
          np.zeros((batch, S), np.int32),
          rng.uniform(-3, 3, (batch,)).astype(np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), hb)
    db = trainer._put_batch(hb)

    for _ in range(3):
        state, loss = trainer._train_step(state, db)
    float(jax.device_get(loss))

    with trace(trace_dir):
        for _ in range(5):
            state, loss = trainer._train_step(state, db)
        float(jax.device_get(loss))
    print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
