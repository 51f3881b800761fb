"""Summarize/diff jax.profiler traces of the train-step chunk.

Reads the Perfetto JSON (vm.trace.json.gz) a --profile_dir /
examples/trace_mlp_ab.py capture produces, aggregates TPU-device op
durations (the 'XLA Ops' track, container ops excluded), and reports
per-step busy/idle accounting.  With two dirs, prints a per-op diff —
the tool VERDICT r4 #1 asks for to localize the custom-call scheduling
penalty.

Usage:
    python examples/trace_summarize.py tmp/r5/trace_mlp_xla [tmp/r5/trace_mlp_pallas]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


CONTAINERS = re.compile(r'^(while|conditional|jit_|body|cond)')


def load_device_ops(trace_dir):
    """-> (ops: {name: total_us}, step_total_us, busy_us, span_us)."""
    paths = glob.glob(os.path.join(trace_dir, 'plugins/profile/*/*.trace.json.gz'))
    assert paths, f"no trace json under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path) as f:
        d = json.load(f)
    ev = d['traceEvents']
    tnames, pnames = {}, {}
    for e in ev:
        if e.get('ph') == 'M':
            if e.get('name') == 'thread_name':
                tnames[(e['pid'], e['tid'])] = e['args'].get('name')
            elif e.get('name') == 'process_name':
                pnames[e['pid']] = e['args'].get('name')
    tpu_pids = {p for p, n in pnames.items() if n and 'TPU' in n}
    ops = collections.Counter()
    intervals = []
    module_total = 0.0
    for e in ev:
        if e.get('ph') != 'X' or e['pid'] not in tpu_pids:
            continue
        tn = tnames.get((e['pid'], e['tid']), '')
        if tn == 'XLA Modules':
            module_total += e['dur']
        if tn != 'XLA Ops' or CONTAINERS.match(e['name']):
            continue
        ops[e['name']] += e['dur']
        intervals.append((e['ts'], e['ts'] + e['dur']))
    # busy time = union of leaf-op intervals (ops can nest inside fusions)
    intervals.sort()
    busy, span = 0.0, 0.0
    if intervals:
        lo, hi = intervals[0]
        start, end = lo, intervals[-1][1]
        for s, t in intervals[1:]:
            if s > hi:
                busy += hi - lo
                lo, hi = s, t
            else:
                hi = max(hi, t)
        busy += hi - lo
        span = end - start
    return ops, module_total, busy, span


def group(name):
    """Collapse versioned op names (fusion.12 -> fusion...) for diffing."""
    return re.sub(r'\.\d+$', '', name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('dirs', nargs='+')
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--top', type=int, default=18)
    args = ap.parse_args()

    summaries = []
    for d in args.dirs:
        ops, module_us, busy, span = load_device_ops(d)
        g = collections.Counter()
        for name, dur in ops.items():
            g[group(name)] += dur
        summaries.append((d, g, module_us, busy, span))
        print(f"\n=== {d}")
        print(f"module total: {module_us / args.steps / 1e3:.3f} ms/step | "
              f"leaf-op busy: {busy / args.steps / 1e3:.3f} ms/step | "
              f"span: {span / args.steps / 1e3:.3f} ms/step | "
              f"idle within span: {(span - busy) / args.steps / 1e3:.3f} ms/step")
        for name, dur in g.most_common(args.top):
            print(f"  {dur / args.steps:9.2f} us/step  {name[:70]}")

    if len(summaries) == 2:
        (da, ga, *_), (db, gb, *_) = summaries
        print(f"\n=== diff (B - A) per op group, us/step  [A={da}  B={db}]")
        keys = set(ga) | set(gb)
        rows = sorted(keys, key=lambda k: -(gb.get(k, 0) - ga.get(k, 0)))
        for k in rows:
            delta = (gb.get(k, 0) - ga.get(k, 0)) / args.steps
            if abs(delta) < 2.0:
                continue
            print(f"  {delta:+9.2f}  (A {ga.get(k, 0) / args.steps:8.2f} -> "
                  f"B {gb.get(k, 0) / args.steps:8.2f})  {k[:60]}")


if __name__ == '__main__':
    main()
