"""Per-fusion byte-rate audit of a captured XProf trace (round-4
dossier tooling: BENCH_NOTES "HLO emitter audit" was done by hand in
round 3; this makes it reproducible and attributes GB/s + TOP/s per
fusion so the conv-fusion-vs-loop-fusion gap has per-emitter evidence).

For every device op event in the newest trace under --outdir, groups by
op name and reports: calls, total ms, bytes_accessed (XLA cost-model
operand+result bytes), achieved GB/s, a fwd/bwd guess for conv fusions
(from the operand signature: backward convs read an s8/bf16 cotangent
code tensor and either lhs-dilate or carry a CHWN/IHWO layout — we tag
by the fusion's result shapes instead: dW fusions emit kernel-shaped
f32, dx fusions emit activation-shaped outputs with reversed kernels),
and the conv MAC rate when the long_name exposes a convolution shape.

Usage: python benchmarks/fusion_audit.py [--outdir /tmp/lbt_profile_r4]
       [--top 30] [--json out.json]
"""

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict

_SHAPE_RE = re.compile(r"(s8|bf16|f32|s32|u32|pred|s16)\[([0-9,]*)\]")
_BYTES = {"s8": 1, "pred": 1, "bf16": 2, "s16": 2, "f32": 4, "s32": 4,
          "u32": 4}


def parse_shapes(sig: str):
    out = []
    for dt, dims in _SHAPE_RE.findall(sig):
        shape = tuple(int(d) for d in dims.split(",") if d)
        out.append((dt, shape))
    return out


def classify(long_name: str) -> str:
    """Heuristic fwd/dx/dW tag for convolution fusions."""
    # dW fusions produce kernel-shaped f32 outputs (small, 4-d with two
    # small leading dims); dx fusions lhs-dilate (window reversal shows
    # as 'rhs_reversal' or stride-dilated operands); everything else fwd.
    if "kernel" in long_name:
        return "?"
    if re.search(r"window=\{[^}]*rhs_dilate", long_name):
        return "dW"
    if re.search(r"window=\{[^}]*lhs_dilate", long_name):
        return "dx"
    return "fwd/other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/lbt_profile_r4")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=4,
                    help="unroll count the trace covers (per-step scale)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    paths = glob.glob(os.path.join(args.outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    rows = defaultdict(lambda: {"ms": 0.0, "calls": 0, "bytes": 0,
                                "cat": "", "long": ""})
    for e in data.get("traceEvents", []):
        a = e.get("args") or {}
        if e.get("ph") != "X" or "hlo_category" not in a:
            continue
        cat = a["hlo_category"]
        if cat in ("while", "conditional"):
            continue  # wrappers double-count their bodies
        r = rows[e["name"]]
        r["ms"] += e.get("dur", 0.0) / 1e3
        r["calls"] += 1
        r["bytes"] += int(a.get("bytes_accessed", 0) or 0)
        r["cat"] = cat
        if not r["long"]:
            r["long"] = a.get("long_name", "")

    table = []
    for name, r in rows.items():
        gbs = (r["bytes"] / 1e9) / (r["ms"] / 1e3) if r["ms"] else 0.0
        table.append({
            "name": name, "cat": r["cat"], "calls": r["calls"],
            "ms_total": round(r["ms"], 3),
            "ms_per_step": round(r["ms"] / args.steps, 3),
            "gb_per_step": round(r["bytes"] / 1e9 / args.steps, 3),
            "gbps": round(gbs, 1),
            "kind": (classify(r["long"])
                     if r["cat"] == "convolution fusion" else ""),
        })
    table.sort(key=lambda r: -r["ms_total"])

    total = sum(r["ms_total"] for r in table)
    conv = [r for r in table if r["cat"] == "convolution fusion"]
    loop = [r for r in table if r["cat"] == "loop fusion"]
    print(f"trace {os.path.basename(path)}  device-op total "
          f"{total:.1f} ms ({args.steps} steps)")
    for label, rs in (("convolution fusions", conv),
                      ("loop fusions", loop)):
        ms = sum(r["ms_total"] for r in rs)
        gb = sum(r["gb_per_step"] * args.steps for r in rs)
        print(f"{label}: {ms:.1f} ms, {gb:.1f} GB, "
              f"{gb / (ms / 1e3):.0f} GB/s avg")
    for kind in ("fwd/other", "dx", "dW"):
        rs = [r for r in conv if r["kind"] == kind]
        ms = sum(r["ms_total"] for r in rs)
        gb = sum(r["gb_per_step"] * args.steps for r in rs)
        print(f"  conv[{kind}]: {len(rs)} fusions, {ms:.1f} ms, "
              f"{gb / max(ms / 1e3, 1e-9):.0f} GB/s")

    print(f"\ntop {args.top} ops:")
    print(f"{'ms/step':>8} {'GB/step':>8} {'GB/s':>6} {'kind':>9}  name")
    for r in table[:args.top]:
        print(f"{r['ms_per_step']:8.3f} {r['gb_per_step']:8.3f} "
              f"{r['gbps']:6.0f} {r['kind']:>9}  {r['name']} [{r['cat']}]")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"trace": path, "steps": args.steps,
                       "rows": table}, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
