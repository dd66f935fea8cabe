"""Aggregate a jax.profiler perfetto trace into a per-op cost table.

Usage: python tools/parse_trace.py <trace_dir> [--top 30] [--by source|name]

Reads the newest ``*.trace.json.gz`` under ``<trace_dir>/plugins/profile``,
keeps the device-side XLA op events (the TPU pid's "XLA Ops" track — host
tracks are skipped), and prints total duration grouped by fused-op name or
by the ``args.source`` attribution XLA records (op -> python source line).

This is the round-3 methodology (CLAUDE.md "jax.profiler.trace works
through the tunnel") packaged as a tool; it backed the scalar-core-gather
and resize-precision findings in BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_events(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device pids: process_name metadata containing TPU/device; XLA Ops tid
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device:" in n}
    op_tids = {pt for pt, n in tid_names.items() if "XLA Ops" in n}
    return events, dev_pids, op_tids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--by", default="name", choices=["name", "source"])
    args = ap.parse_args()

    events, dev_pids, op_tids = load_events(args.trace_dir)
    tot = collections.Counter()
    cnt = collections.Counter()
    all_us = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if op_tids and (e["pid"], e.get("tid")) not in op_tids:
            continue
        dur = float(e.get("dur", 0.0))
        if args.by == "source":
            key = (e.get("args") or {}).get("source", e.get("name", "?"))
        else:
            key = e.get("name", "?")
            # strip the .NN suffix XLA appends to repeated fusions
            base, dot, tail = key.rpartition(".")
            if dot and tail.isdigit():
                key = base
        tot[key] += dur
        cnt[key] += 1
        all_us += dur
    print(f"total device op time: {all_us / 1e3:.1f} ms "
          f"({sum(cnt.values())} events)")
    for key, us in tot.most_common(args.top):
        print(f"{us / 1e3:9.2f} ms {100 * us / max(all_us, 1e-9):5.1f}% "
              f"x{cnt[key]:<5d} {key[:110]}")


if __name__ == "__main__":
    main()
