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


_PEAK_BF16 = {
    # chip bf16 MXU peak, FLOP/s (dense)
    "TPU v5 lite": 197e12,        # v5e
    "TPU v5": 459e12,             # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,        # v6e / Trillium
}


def peak_flops(device=None):
    """bf16 MXU peak of the attached chip (FLOP/s); MFU numbers are
    conventionally quoted against the bf16 peak. Unknown chips fall
    back to v5e."""
    d = device or jax.devices()[0]
    return _PEAK_BF16.get(getattr(d, "device_kind", ""), 197e12)
