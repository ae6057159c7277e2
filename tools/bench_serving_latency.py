"""Serving latency benchmark: per-request p50/p90/p99 through Predictor.

bench.py's BENCH_MODE=eval measures steady-state *throughput* (chained
jitted steps, one sync at the end). Production serving also cares about
per-request latency at small batch: this tool times individual requests
through the real `serving.Predictor` forward — host numpy in,
predictions fetched back to host — so every sample includes the
host->device transfer, the jitted forward, and the device->host fetch,
exactly what a request sees. (The reference has no serving surface at
all: its best model only ever lives as an in-memory state_dict,
/root/reference/multimodal_driver.py:483-552.)

Each request is synced by fetching the prediction VALUES (device_get);
on the tunneled backend block_until_ready returns early (CLAUDE.md), so
value-fetch is the only honest per-call sync. The tunnel adds a
~2 ms dispatch floor to every call — real for this deployment, noted in
the output so on-host numbers can be extrapolated.

Env knobs: LAT_BATCHES="1,8,32,128,256", LAT_CALLS=50, LAT_SEQ=50,
LAT_MODEL=bert|bert-large|xlnet, LAT_ATTN=fused|einsum|flash.

Run: python tools/bench_serving_latency.py   (real TPU; cold compiles
one program per batch size — minutes each through the tunnel, cached
after).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import dataclasses

    import jax.numpy as jnp

    from bert_multimodal_transformer_tpu.config import (
        BertConfig,
        DatasetConfig,
        MultimodalConfig,
        XLNetConfig,
    )
    from bert_multimodal_transformer_tpu.serving import Predictor

    family = os.environ.get("LAT_MODEL", "bert")
    seq = int(os.environ.get("LAT_SEQ", "50"))
    n_calls = int(os.environ.get("LAT_CALLS", "50"))
    warmup = 10
    batches = [int(b) for b in os.environ.get(
        "LAT_BATCHES", "1,8,32,128,256").split(",")]
    attn = os.environ.get("LAT_ATTN", "fused")

    ds = DatasetConfig.mosi()
    mm = MultimodalConfig(
        beta_shift=1.0, dropout_prob=0.5,
        injection_index=1 if family == "xlnet" else 0)
    if family == "xlnet":
        from bert_multimodal_transformer_tpu.models.xlnet import (
            MagXLNetForSequenceClassification,
        )

        cfg = XLNetConfig.xlnet_base_cased()
        if attn != "einsum":
            cfg = dataclasses.replace(cfg, attention_impl=attn)
        model = MagXLNetForSequenceClassification(
            cfg, mm, visual_dim=ds.visual_dim,
            acoustic_dim=ds.acoustic_dim, dtype=jnp.bfloat16)
    else:
        cfg = (BertConfig.bert_large_uncased() if family == "bert-large"
               else BertConfig.bert_base_uncased())
        if attn != "einsum":
            cfg = dataclasses.replace(cfg, attention_impl=attn)
        from bert_multimodal_transformer_tpu.models.bert import (
            MagBertForSequenceClassification,
        )

        model = MagBertForSequenceClassification(
            cfg, mm, visual_dim=ds.visual_dim,
            acoustic_dim=ds.acoustic_dim, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)

    def host_inputs(batch):
        return (
            rng.randint(0, cfg.vocab_size, (batch, seq)).astype(np.int32),
            rng.randn(batch, seq, ds.visual_dim).astype(np.float32),
            rng.randn(batch, seq, ds.acoustic_dim).astype(np.float32),
            np.ones((batch, seq), np.int32),
            np.zeros((batch, seq), np.int32),
        )

    ids, vis, ac, mask, segs = host_inputs(2)
    params = model.init(jax.random.PRNGKey(0), ids, vis, ac,
                        attention_mask=mask, token_type_ids=segs,
                        deterministic=True)["params"]

    # LAT_WIRE_DTYPE=bfloat16 casts the modality features host-side
    # before the transfer (Predictor(wire_dtype=...) semantics): halves
    # the request payload; lossless for a bf16-compute model.
    wire = os.environ.get("LAT_WIRE_DTYPE")
    wdt = getattr(jnp, wire) if wire else None

    # LAT_MODE=split: batch-stream throughput through the REAL
    # Predictor.predict_split (host split in, ordered predictions out)
    # at one batch size (LAT_BATCHES first entry), A/B'ing
    # prefetch=0 (strictly serial transfer->compute->fetch) vs
    # prefetch=2 (transfers overlap the chip via async dispatch).
    if os.environ.get("LAT_MODE") == "split":
        from bert_multimodal_transformer_tpu.data.pipeline import (
            PackedSplit,
        )

        n = int(os.environ.get("LAT_SPLIT_N", "4096"))
        batch = batches[0]
        ids, vis, ac, mask, segs = host_inputs(n)
        split = PackedSplit(ids, vis, ac, mask, segs,
                            rng.uniform(-3, 3, (n,)).astype(np.float32))
        rows = []
        for pf in (0, 2):
            pred = Predictor(model, params, batch_size=batch,
                             wire_dtype=wdt, prefetch=pf)
            pred.predict_split(split.take(np.arange(2 * batch)))  # warm
            t0 = time.perf_counter()
            out = pred.predict_split(split)
            dt = time.perf_counter() - t0
            assert out.shape[0] == n
            rows.append({"prefetch": pf, "sec": round(dt, 3),
                         "ex_per_s": round(n / dt, 1)})
            print(f"predict_split b{batch} prefetch={pf}: {dt:6.3f}s  "
                  f"{n / dt:8.1f} ex/s", flush=True)
        print(json.dumps({
            "metric": f"predict_split throughput ({family}, b{batch}, "
                      f"seq {seq}, {attn}"
                      + (f", {wire} wire" if wire else "") + ")",
            "rows": rows,
        }))
        return

    # LAT_MODE=requests: independent-request throughput through
    # Predictor.predict_requests, A/B'ing in_flight=1 (synchronous
    # request loop — the per-request latency mode below) vs 2/4
    # (request N+1's transfer+forward overlap request N's fetch). The
    # gap toward bench.py's chained-throughput bound is the tunnel
    # round-trip recovered by concurrency.
    if os.environ.get("LAT_MODE") == "requests":
        n_req = int(os.environ.get("LAT_REQUESTS", "50"))
        batch = batches[0]
        pred = Predictor(model, params, batch_size=batch, wire_dtype=wdt)
        reqs = [host_inputs(batch) for _ in range(8)]
        rows = []
        for in_flight in (1, 2, 4):
            list(pred.predict_requests(iter(reqs), in_flight=in_flight))
            t0 = time.perf_counter()
            got = 0
            for out in pred.predict_requests(
                    (reqs[i % len(reqs)] for i in range(n_req)),
                    in_flight=in_flight):
                got += out.shape[0]
            dt = time.perf_counter() - t0
            assert got == n_req * batch
            rows.append({"in_flight": in_flight,
                         "req_per_s": round(n_req / dt, 2),
                         "ex_per_s": round(got / dt, 1),
                         "mean_ms": round(dt / n_req * 1e3, 2)})
            print(f"requests b{batch} in_flight={in_flight}: "
                  f"{dt / n_req * 1e3:7.2f} ms/req  "
                  f"{got / dt:8.1f} ex/s", flush=True)
        print(json.dumps({
            "metric": f"serving request concurrency ({family}, b{batch}, "
                      f"seq {seq}, {attn}"
                      + (f", {wire} wire" if wire else "") + ")",
            "rows": rows,
        }))
        return

    results = []
    for batch in batches:
        pred = Predictor(model, params, batch_size=batch)
        inp = host_inputs(batch)

        def request():
            ids, vis, ac, mask, segs = inp
            if wdt is not None:
                vis = vis.astype(wdt)
                ac = ac.astype(wdt)
            out = pred._forward(
                pred.params,
                *[jax.device_put(x, pred._bsh)
                  for x in (ids, vis, ac, mask, segs)])
            return np.asarray(jax.device_get(out))

        for _ in range(warmup):
            request()
        samples = []
        for _ in range(n_calls):
            t0 = time.perf_counter()
            request()
            samples.append((time.perf_counter() - t0) * 1e3)
        samples.sort()

        def pct(p):
            return samples[min(len(samples) - 1,
                               int(round(p / 100 * (len(samples) - 1))))]

        row = {
            "batch": batch,
            "p50_ms": round(pct(50), 2),
            "p90_ms": round(pct(90), 2),
            "p99_ms": round(pct(99), 2),
            "mean_ms": round(sum(samples) / len(samples), 2),
            "ex_per_s": round(batch / (sum(samples) / len(samples)) * 1e3,
                              1),
        }
        results.append(row)
        print(f"b{batch:<4d} p50 {row['p50_ms']:7.2f} ms  "
              f"p90 {row['p90_ms']:7.2f}  p99 {row['p99_ms']:7.2f}  "
              f"mean {row['mean_ms']:7.2f}  {row['ex_per_s']:8.1f} ex/s",
              flush=True)

    print(json.dumps({
        "metric": f"serving per-request latency ({family}, seq {seq}, "
                  f"{attn} attention"
                  + (f", {wire} wire" if wire else "")
                  + ", incl. ~2ms tunnel dispatch floor)",
        "rows": results,
    }))


if __name__ == "__main__":
    main()
