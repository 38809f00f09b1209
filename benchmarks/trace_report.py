"""Aggregate a JAX perfetto device trace into a per-op-category table.

Pairs with benchmarks/trace_step.py: that script writes a
`*.trace.json.gz` under its --logdir via jax.profiler; this one finds the
newest trace, keeps the device-side "XLA Ops" lane, and rolls op time up
into categories (GEMM fusions, Pallas custom-calls, RNG, copies, ...).

Usage: python benchmarks/trace_report.py --logdir /tmp/jax-trace [--top 30]
"""
import argparse
import collections
import gzip
import json
import re
from pathlib import Path


def load_newest_trace(logdir):
    paths = sorted(Path(logdir).rglob("*.trace.json.gz"),
                   key=lambda p: p.stat().st_mtime)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        return paths[-1], json.load(f)


def device_op_events(trace):
    """Yield complete ('X') events from device-side XLA-op lanes.

    The profiler emits one process per device plus host processes; op-level
    events live on threads named like "XLA Ops".  Fall back to any TPU-pid
    lane if the thread names differ between jaxlib versions.
    """
    events = trace.get("traceEvents", [])
    pid_name = {}
    tid_name = {}
    for ev in events:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pid_name[ev["pid"]] = ev["args"].get("name", "")
            elif ev.get("name") == "thread_name":
                tid_name[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
    device_pids = {p for p, n in pid_name.items()
                   if "TPU" in n or "/device:" in n}
    op_lanes = {k for k, n in tid_name.items()
                if k[0] in device_pids and "XLA Ops" in n}
    use_lanes = bool(op_lanes)
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        key = (ev.get("pid"), ev.get("tid"))
        if use_lanes:
            if key in op_lanes:
                yield ev
        elif ev.get("pid") in device_pids:
            yield ev


_CATEGORIES = [
    ("pallas", re.compile(r"custom-call|tpu_custom_call|flash|resample",
                          re.I)),
    ("conv", re.compile(r"convolution", re.I)),
    ("gemm", re.compile(r"dot|einsum|matmul", re.I)),
    ("rng", re.compile(r"rng|bit-?generator|threefry|philox", re.I)),
    ("copy/layout", re.compile(r"copy|transpose|bitcast|reshape|pad\b|pad\.",
                               re.I)),
    ("gather/scatter", re.compile(r"gather|scatter|dynamic-slice"
                                  r"|dynamic-update", re.I)),
    ("sort", re.compile(r"sort", re.I)),
    ("reduce", re.compile(r"reduce|all-reduce", re.I)),
    ("select/cond", re.compile(r"select|conditional|while", re.I)),
    ("fusion(other)", re.compile(r"fusion|loop", re.I)),
]


def categorize(name, hlo_category=""):
    """Map an op event to a coarse category.

    `hlo_category` should be the profiler's own args["hlo_category"] when
    present (the true opcode bucket, e.g. "custom-call") — matching the raw
    long_name HLO text instead mis-buckets fusions whose *operands* are
    custom-calls as pallas, and "convert_…" fusions as conv.
    """
    if hlo_category:
        for cat, rx in _CATEGORIES:
            if rx.search(hlo_category):
                return cat
    for cat, rx in _CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/jax-trace")
    ap.add_argument("--top", type=int, default=30,
                    help="also print the top-N individual ops")
    ap.add_argument("--steps", type=int, default=1,
                    help="number of traced steps, to report per-step ms")
    args = ap.parse_args()

    path, trace = load_newest_trace(args.logdir)
    per_op = collections.defaultdict(lambda: [0.0, 0])   # name -> [us, count]
    per_cat = collections.defaultdict(float)
    t0, t1 = float("inf"), 0.0
    for ev in device_op_events(trace):
        dur = float(ev["dur"])
        name = ev.get("name", "?")
        a = ev.get("args") or {}
        # the profiler's own hlo_category is the true opcode bucket; raw
        # long_name text would mis-bucket fusions by their operand names
        per_op[name][0] += dur
        per_op[name][1] += 1
        per_cat[categorize(name, str(a.get("hlo_category") or ""))] += dur
        ts = float(ev.get("ts", 0.0))
        t0, t1 = min(t0, ts), max(t1, ts + dur)

    total_us = sum(per_cat.values())
    if not total_us:
        raise SystemExit(f"no device op events in {path}")
    wall_us = (t1 - t0) if t1 > t0 else total_us
    n = max(args.steps, 1)
    print(f"trace: {path}")
    print(f"device op time: {total_us/1e3:.1f} ms total, "
          f"{total_us/1e3/n:.1f} ms/step over {n} steps "
          f"(lane wall {wall_us/1e3:.1f} ms; gaps = "
          f"{(wall_us-total_us)/1e3:.1f} ms)")
    print("\nper category (ms/step, % of op time):")
    for cat, us in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<16} {us/1e3/n:9.2f} ms  {100*us/total_us:5.1f}%")
    print(f"\ntop {args.top} ops (ms/step, count/step):")
    ranked = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:args.top]
    for name, (us, count) in ranked:
        print(f"  {us/1e3/n:9.2f} ms  x{count/n:6.1f}  {name[:90]}")


if __name__ == "__main__":
    main()
