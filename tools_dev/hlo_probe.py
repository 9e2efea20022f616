"""Dev probe: compiled-HLO inspection of the SDR scan body (WSJ shape).

Dumps the optimized HLO of the canonical-WSJ single-layer factored SDR
scan (fwd and train) so the per-step op mix / layouts / fusion decisions
are visible, plus XLA's own cost analysis. Helps decide whether a Pallas
formulation can beat the XLA scan.

Run: python tools_dev/hlo_probe.py [--mode fwd|grad] [--impl auto]
"""

import argparse
import re
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="fwd")
    parser.add_argument("--impl", default="auto")
    parser.add_argument("--batch", type=int, default=40)
    parser.add_argument("--seq", type=int, default=150)
    parser.add_argument("--full", action="store_true",
                        help="print the full while-body HLO")
    args = parser.parse_args()

    from srf_tpu.ops.routing import route_layer, window_stack

    # canonical WSJ middle layer: ch=30, window 5 -> in_n=150, d=20
    B, T, ch, cd, win = args.batch, args.seq, 30, 20, 5
    in_n = ch * win
    host = np.random.RandomState(0)
    u = jnp.asarray(host.randn(B, T, ch, cd), jnp.float32)
    wgt = jnp.asarray(host.randn(in_n, ch, cd, cd) * 0.05, jnp.float32)
    bias = jnp.asarray(host.randn(in_n, ch, cd) * 0.01, jnp.float32)

    def fwd(u, wgt, bias):
        uw = window_stack(u, 2, 2)
        out = route_layer(uw, wgt, bias, 1, True, False,
                          impl=args.impl, remat=True)
        return jnp.sum(out * out)

    if args.mode == "fwd":
        fn = fwd
    else:
        fn = jax.grad(fwd, argnums=(0, 1, 2))

    lowered = jax.jit(fn).lower(u, wgt, bias)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print("== memory analysis ==")
    try:
        m = compiled.memory_analysis()
        print(m)
    except Exception as e:
        print("unavailable:", e)
    print("== cost analysis ==")
    try:
        c = compiled.cost_analysis()
        if isinstance(c, list):
            c = c[0]
        for k in sorted(c):
            if c[k] and ("flops" in k or "bytes" in k or "time" in k):
                print(f"  {k}: {c[k]:.3e}")
    except Exception as e:
        print("unavailable:", e)

    # pull out while-loop bodies (the scan)
    bodies = re.findall(r"%(wide\.)?region_\S*body\S*[\s\S]*?\n}\n", txt)
    print(f"== HLO: {len(txt.splitlines())} lines total, "
          f"{len(bodies)} loop bodies ==")
    if args.full:
        print(txt)
        return
    # summarize: ops inside while bodies with shapes
    interesting = []
    in_body = False
    depth = 0
    for line in txt.splitlines():
        if re.search(r"^%?\S*(body|region)\S*\s*\(", line) and "{" in line:
            in_body = True
        if in_body:
            mm = re.match(r"\s+\S+ = (\S+?)\[([\d,]*)\][^ ]* (\w+)", line)
            if mm and mm.group(3) in (
                "fusion", "dot", "convolution", "custom-call",
                "dynamic-slice", "dynamic-update-slice", "copy",
                "transpose", "reshape", "all-reduce",
            ):
                interesting.append(
                    (mm.group(3), mm.group(1), mm.group(2), line.strip()[:160])
                )
            if line.startswith("}"):
                in_body = False
    from collections import Counter

    counts = Counter((op, dt, shp) for op, dt, shp, _ in interesting)
    for (op, dt, shp), n in sorted(counts.items(), key=lambda x: -x[1]):
        print(f"  {n:3d}x {op:22s} {dt}[{shp}]")


if __name__ == "__main__":
    main()
