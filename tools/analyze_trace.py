"""Aggregate a jax.profiler chrome-trace (vm.trace.json.gz) into an
op-level time attribution report.

Usage: python tools/analyze_trace.py /tmp/jaxtrace [n_steps]

Groups device-stream events by HLO category, by source file:line, and by
forward/backward/optimizer phase (inferred from the tf_op path — jvp(...)
is forward, transpose(jvp(...)) is backward, anything mentioning the
optimizer tree is the update). Times are reported per training step.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/",
                                   "*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    data = json.load(gzip.open(path, "rt"))
    events = data["traceEvents"]
    # device pid: process named /device:TPU:*
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:" in str(e.get("args", {}).get("name", ""))}
    ev = [e for e in events if e.get("ph") == "X" and e.get("pid") in
          dev_pids and "args" in e]
    # keep the tid with the most events — the op-level compute stream
    # (other tids hold whole-module envelope events)
    tid_n = collections.Counter((e["pid"], e["tid"]) for e in ev)
    main = max(tid_n, key=tid_n.get)
    return [e for e in ev if (e["pid"], e["tid"]) == main], path


def phase_of(tf_op: str) -> str:
    if "transpose(jvp(" in tf_op:
        return "backward"
    if "jvp(" in tf_op:
        return "forward"
    return "optimizer/other"


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    ev, path = load_events(trace_dir)
    tot = sum(e["dur"] for e in ev)
    print(f"trace: {path}")
    print(f"device busy time: {tot/1e3/n_steps:.2f} ms/step over "
          f"{n_steps} steps, {len(ev)} events\n")

    def ms(x):
        return x / 1e3 / n_steps

    by_cat = collections.Counter()
    by_src = collections.Counter()
    by_phase = collections.Counter()
    by_phase_cat = collections.Counter()
    flops_total = 0
    for e in ev:
        a = e["args"]
        cat = a.get("hlo_category", "?")
        src = a.get("source", "?")
        ph = phase_of(a.get("tf_op", ""))
        by_cat[cat] += e["dur"]
        by_src[src] += e["dur"]
        by_phase[ph] += e["dur"]
        by_phase_cat[(ph, cat)] += e["dur"]
        try:
            flops_total += int(a.get("model_flops", 0) or 0)
        except ValueError:
            pass

    print("== by phase ==")
    for k, d in by_phase.most_common():
        print(f"  {ms(d):8.2f} ms  {k}")

    print("\n== by HLO category ==")
    for k, d in by_cat.most_common(20):
        print(f"  {ms(d):8.2f} ms  {k}")

    print("\n== by phase x category (top 25) ==")
    for (ph, cat), d in by_phase_cat.most_common(25):
        print(f"  {ms(d):8.2f} ms  {ph:18s} {cat}")

    print("\n== by source line (top 30) ==")
    for k, d in by_src.most_common(30):
        print(f"  {ms(d):8.2f} ms  {k}")

    if flops_total:
        steps_flops = flops_total / n_steps
        secs = tot / 1e6 / n_steps
        print(f"\nmodel TFLOP/step: {steps_flops/1e12:.2f}; "
              f"achieved {steps_flops/secs/1e12:.1f} TFLOP/s over busy time")


if __name__ == "__main__":
    main()
