"""Trace one K-Planes train step and print per-source-line time totals.

Usage: python scripts/profile_step.py [ablation] [n_steps]
Writes the xplane trace under /tmp/snt_trace and aggregates device busy
time by the emitting source line (each XLA op carries ``args.source``).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import sys

import jax

sys.path.insert(0, "/root/repo")


def run(ablation: str = "noprop", n_steps: int = 8):
    from scripts.ablate_step import build

    train_props = not ablation.startswith("np_") and ablation != "noprop"
    step_fn, state, make_batch = build(ablation)
    batches = [make_batch(i) for i in range(4)]
    state, loss = step_fn(state, *batches[0], train_props)
    jax.block_until_ready(loss)
    state, loss = step_fn(state, *batches[1], train_props)
    jax.block_until_ready(loss)

    with jax.profiler.trace("/tmp/snt_trace"):
        for i in range(n_steps):
            state, loss = step_fn(state, *batches[i % 4], train_props)
        jax.block_until_ready(loss)
    return n_steps


def parse(n_steps: int, top: int = 45):
    paths = sorted(glob.glob("/tmp/snt_trace/**/*.trace.json.gz", recursive=True))
    assert paths, "no trace found"
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    agg = collections.Counter()
    total = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_names.get((e.get("pid"), e.get("tid")), ""):
            continue
        if "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        dur = e.get("dur", 0)
        args = e.get("args", {})
        src = args.get("source", "?").replace("/root/repo/soccernerfs_tpu/", "")
        src = src.replace("/opt/venv/lib/python3.12/site-packages/", "")
        op = e.get("name", "?")
        kind = op.split(".")[0]
        if src == "?" and "--ops" in sys.argv:
            kind = op[:60]
        agg[f"{src} [{kind}]"] += dur
        total += dur
    print(f"\n== device busy: {total/n_steps/1e3:.1f} ms/step ==")
    for k, v in agg.most_common(top):
        print(f"{v/n_steps/1e3:8.2f}  {k}")


if __name__ == "__main__":
    ablation = sys.argv[1] if len(sys.argv) > 1 else "noprop"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ns = run(ablation, n)
    parse(ns)
