"""Aggregate a jax.profiler capture into an XLA op-class breakdown.

Usage:
  python tools/parse_profile.py /tmp/prof/b1 [/tmp/prof/b8 ...]

Reads the Chrome-trace JSON (`*.trace.json.gz`) written by
`bench.py --profile` / utils.metrics.ProfilerWindow, keeps only the TPU
device's "XLA Ops" lane, and buckets op durations into the classes used by
docs/DESIGN.md §9/§9c: convolutions, pallas custom calls (flash/one-pass
attention), generic fusions, convert+reduce fusions (fp32 norm stats),
layout copies, matmuls, collectives. Prints a table + one JSON line per
profile dir.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def classify(name: str) -> str:
    n = name.lower()
    if ("custom-call" in n or "custom_call" in n or "tpu_custom_call" in n
            or "flash" in n or "onepass" in n or "mosaic" in n):
        return "pallas custom calls"
    if "fusion" in n:  # before the conv check: convert_reduce_fusion etc.
        if "convert" in n or "reduce" in n:
            return "convert/reduce fusions (norm stats)"
        if "convolution" in n or n.startswith("conv"):
            return "conv fusions"
        return "generic fusions"
    if "convolution" in n:
        return "convolutions"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout copies"
    if ("all-reduce" in n or "all-gather" in n or "reduce-scatter" in n
            or "collective" in n):
        return "collectives"
    if n.startswith("dot") or "matmul" in n or n.startswith("%dot"):
        return "matmuls"
    if "dynamic" in n and "slice" in n:
        return "dynamic slice/update"
    return "other"


def aggregate(profile_dir: str):
    paths = glob.glob(os.path.join(profile_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {profile_dir}")
    by_class = defaultdict(float)
    by_op = defaultdict(float)
    total_us = 0.0
    for path in paths:
        data = json.load(gzip.open(path))
        events = data["traceEvents"]
        # map (pid) -> device?, (pid, tid) -> lane name
        device_pids = set()
        lane = {}
        for e in events:
            if e.get("ph") != "M":
                continue
            if e.get("name") == "process_name" \
                    and "/device:TPU" in e["args"].get("name", ""):
                device_pids.add(e["pid"])
            if e.get("name") == "thread_name":
                lane[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in device_pids:
                continue
            if lane.get((e["pid"], e.get("tid"))) != "XLA Ops":
                continue
            name = e.get("name", "")
            # control-flow wrappers (the denoise lax.while, conditionals)
            # span their whole body, which is ALSO reported op-by-op —
            # counting them would double the total
            low = name.lower()
            if low.startswith(("while", "conditional", "call")):
                continue
            dur = float(e.get("dur", 0.0))  # microseconds
            by_op[name] += dur
            by_class[classify(name)] += dur
            total_us += dur
    return by_class, by_op, total_us


def main(argv):
    out = []
    for d in argv:
        by_class, by_op, total = aggregate(d)
        if total == 0:
            print(f"{d}: empty device trace")
            continue
        ms = {k: v / 1e3 for k, v in by_class.items()}
        print(f"\n=== {d} (XLA Ops device total {total / 1e3:.1f} ms) ===")
        for k, v in sorted(ms.items(), key=lambda kv: -kv[1]):
            print(f"  {k:42s} {v:9.1f} ms  {100 * v * 1e3 / total:5.1f}%")
        print("  top ops:")
        for name, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:8]:
            print(f"    {v / 1e3:8.1f} ms  {name[:90]}")
        rec = {"profile": d, "total_ms": round(total / 1e3, 1),
               "classes_ms": {k: round(v, 1) for k, v in ms.items()}}
        out.append(rec)
        print(json.dumps(rec))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
