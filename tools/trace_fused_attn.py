"""In-model timing of the fused attention kernels via a device trace.

Standalone kernel timing through the tunnel hits a ~1 ms dispatch floor,
so the only trustworthy number is the in-model custom-call duration from
a jax.profiler trace. This builds the bert-base b256 grad step (fused
attention), traces a few steps, and prints the fwd/bwd kernel totals.

Env: FUSED_ATTN_NB_FWD / FUSED_ATTN_NB_BWD to override blocking.
"""

import collections
import glob
import gzip
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

TRACE_DIR = "/tmp/jaxtrace_fa"


def main():
    import dataclasses

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from bert_multimodal_transformer_tpu.config import (
        BertConfig, MultimodalConfig)
    from bert_multimodal_transformer_tpu.models.bert import (
        MagBertForSequenceClassification)
    from bert_multimodal_transformer_tpu.training.losses import mse_loss

    batch, seq = int(os.environ.get("BENCH_BATCH", "256")), 50
    cfg = dataclasses.replace(BertConfig.bert_base_uncased(),
                              attention_impl="fused")
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5,
                          injection_index=0)
    model = MagBertForSequenceClassification(
        cfg, mm, visual_dim=47, acoustic_dim=74, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    d = dict(
        ids=jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, seq)),
                        jnp.int32),
        vis=jnp.asarray(rng.randn(batch, seq, 47), jnp.float32),
        aco=jnp.asarray(rng.randn(batch, seq, 74), jnp.float32),
        mask=jnp.ones((batch, seq), jnp.int32),
        seg=jnp.zeros((batch, seq), jnp.int32),
        lab=jnp.asarray(rng.uniform(-3, 3, (batch,)), jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), d["ids"], d["vis"],
                        d["aco"], d["mask"], d["seg"])["params"]
    key = jax.random.PRNGKey(7)

    def loss_fn(p, dd, c):
        logits = model.apply(
            {"params": p}, dd["ids"], dd["vis"] + c * 1e-30, dd["aco"],
            attention_mask=dd["mask"], token_type_ids=dd["seg"],
            deterministic=False, rngs={"dropout": key})
        return mse_loss(logits, dd["lab"])

    @jax.jit
    def step(p, dd, c):
        loss, grads = jax.value_and_grad(loss_fn)(p, dd, c)
        gsum = jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l).astype(jnp.float32), grads, 0.0)
        return loss + gsum * 1e-30

    c = jnp.zeros(())
    for _ in range(3):
        c = step(params, d, c)
    float(jax.device_get(c))

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    n = 5
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(n):
        c = step(params, d, c)
    float(jax.device_get(c))
    jax.profiler.stop_trace()

    path = max(glob.glob(os.path.join(
        TRACE_DIR, "plugins/profile/*/", "*.trace.json.gz")),
        key=os.path.getmtime)
    data = json.load(gzip.open(path, "rt"))
    dev_pids = {e["pid"] for e in data["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:" in str(e.get("args", {}).get("name", ""))}
    ev = [e for e in data["traceEvents"] if e.get("ph") == "X"
          and e.get("pid") in dev_pids and "args" in e]
    tid_n = collections.Counter((e["pid"], e["tid"]) for e in ev)
    main_t = max(tid_n, key=tid_n.get)
    ev = [e for e in ev if (e["pid"], e["tid"]) == main_t]

    tot = sum(e["dur"] for e in ev) / 1e3 / n
    fwd = sum(e["dur"] for e in ev
              if "attn_fwd" in e["args"].get("long_name", "")
              or ("fused_attention" in e["args"].get("source", "")
                  and "transpose(jvp" not in e["args"].get("tf_op", "")
                  and e["args"].get("hlo_category") == "custom-call")
              ) / 1e3 / n
    bwd = sum(e["dur"] for e in ev
              if "fused_attention" in e["args"].get("source", "")
              and "transpose(jvp" in e["args"].get("tf_op", "")
              and e["args"].get("hlo_category") == "custom-call") / 1e3 / n
    print(json.dumps({
        "grad_step_busy_ms": round(tot, 2),
        "fused_fwd_kernels_ms": round(fwd, 3),
        "fused_bwd_kernels_ms": round(bwd, 3),
        "nb_fwd": os.environ.get("FUSED_ATTN_NB_FWD"),
        "nb_bwd": os.environ.get("FUSED_ATTN_NB_BWD"),
        "batch": batch,
    }))


if __name__ == "__main__":
    main()
