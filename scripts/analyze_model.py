"""Model analysis CLI (reference VPS_Module/tools/analyze_model.py):
parameter counts and per-forward FLOP estimates for the VO and VPS
model families, via jax's cost analysis on the jitted forwards.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))


import argparse


def _param_table(tree, prefix="", rows=None):
    rows = rows if rows is not None else []
    if isinstance(tree, dict):
        for k, v in tree.items():
            _param_table(v, f"{prefix}/{k}" if prefix else k, rows)
    else:
        rows.append((prefix, tuple(getattr(tree, "shape", ())),
                     int(getattr(tree, "size", 0))))
    return rows


def _fmt(n):
    for unit in ("", "K", "M", "G", "T"):
        if abs(n) < 1000:
            return f"{n:.2f}{unit}"
        n /= 1000
    return f"{n:.2f}P"


def _flops(fn, *args):
    import jax
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return float("nan")


def analyze_vo(depth):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pvo_tpu.vo.system import init_params, make_modules

    modules = make_modules()
    params = init_params(modules, image_size=(64, 96))
    print("== VO (DroidNet family) ==")
    total = 0
    for name, tree in params.items():
        rows = _param_table(tree)
        n = sum(r[2] for r in rows)
        total += n
        print(f"  {name:8s}: {_fmt(n)} params")
        if depth > 1:
            for r in sorted(rows, key=lambda r: -r[2])[:8]:
                print(f"      {r[0]:60s} {str(r[1]):20s} {_fmt(r[2])}")
    print(f"  TOTAL   : {_fmt(total)} params")

    H, W = 240, 808
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    f = _flops(lambda p, x: modules["fnet"].apply(p, x),
               params["fnet"], img)
    print(f"  fnet fwd @{H}x{W}: {_fmt(f)} FLOP")


def analyze_vps(depth):
    import jax
    import jax.numpy as jnp

    from pvo_tpu.vps.panoptic_fpn import PanopticFPN

    model = PanopticFPN()
    img = jnp.zeros((1, 384, 1248, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros(
        (1, 64, 96, 3), jnp.float32))
    print("== VPS (Panoptic FPN) ==")
    rows = _param_table(params["params"])
    by_top = {}
    for name, shape, n in rows:
        top = name.split("/")[0]
        by_top[top] = by_top.get(top, 0) + n
    for top, n in sorted(by_top.items(), key=lambda kv: -kv[1]):
        print(f"  {top:14s}: {_fmt(n)} params")
    print(f"  TOTAL         : {_fmt(sum(by_top.values()))} params")

    f = _flops(lambda p, x: model.apply(p, x, method="features"),
               params, img)
    print(f"  backbone+FPN fwd @384x1248: {_fmt(f)} FLOP")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="all",
                   choices=["vo", "vps", "all"])
    p.add_argument("--depth", type=int, default=1,
                   help="2 = also print the largest leaves")
    args = p.parse_args()
    if args.family in ("vo", "all"):
        analyze_vo(args.depth)
    if args.family in ("vps", "all"):
        analyze_vps(args.depth)


if __name__ == "__main__":
    main()
