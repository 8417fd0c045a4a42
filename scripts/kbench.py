"""Trace-verified kernel timing harness.

The remote-TPU relay in this environment acks block_until_ready before
device completion, so wall-clock timings of dispatched work are
meaningless. This harness times a kernel by running it under
jax.profiler.trace and summing the device-op durations — the only
trustworthy number. Usage:

    from scripts.kbench import device_time_ms
    ms = device_time_ms(lambda: my_jitted(x))
"""

import collections
import glob
import gzip
import json
import os
import tempfile

import jax


def _device_op_totals(trace_dir):
    p = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(p) as fh:
        d = json.load(fh)
    pids = {e["pid"]: e["args"].get("name")
            for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in d["traceEvents"]:
        if e.get("ph") == "X" and \
                str(pids.get(e["pid"], "")).startswith("/device:"):
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return agg, cnt


def device_time_ms(fn, top=0):
    """Run fn() once under a profiler trace; return total device-op
    time in ms counting only TOP-LEVEL ops (jit_* envelopes), which
    avoids double-counting nested while bodies. Optionally print the
    `top` most expensive ops."""
    fn()  # ensure compiled
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            out = fn()
            jax.block_until_ready(out)
        agg, cnt = _device_op_totals(td)
    total = sum(v for k, v in agg.items() if k.startswith("jit_"))
    if top:
        for n, v in agg.most_common(top):
            print(f"    {v / 1e3:9.3f} ms {cnt[n]:5d}x  {n[:84]}")
    return total / 1e3
