"""Derive the headline step's roofline fractions (VERDICT round-4 #6).

Consumes a steady-state fusion-audit JSON (fusion_audit.py over a
profile_step.py --base 100001 trace of the headline config) plus the
measured headline throughput, and emits benchmarks/roofline_r05.json
with:

* ``hbm_roofline_frac`` — (XLA cost-model bytes_accessed per step) /
  (device time per step) / HBM peak.  This is the honest
  ceiling-distance number for an HBM-bound step: 1.0 means every
  device-cycle streamed memory at peak.
* ``mxu_int8_frac`` — analytic model FLOPs (ResNet-50/224 conv+fc
  forward ~4.09 GFLOP/img, x3 for fwd+dx+dW) over device time, against
  the int8 MXU peak.  Expected LOW for this workload (it is
  byte-bound, not FLOP-bound) — reported so the bottleneck attribution
  is explicit.

Peaks are the v5e datasheet numbers (819 GB/s HBM, 394.7 TOP/s int8).

Usage: python benchmarks/roofline.py --audit audit_r05.json \
       --img_per_s 2119.9 [--batch 128]
"""

import argparse
import json
import os

_HERE = os.path.dirname(os.path.abspath(__file__))

HBM_PEAK = 819e9          # bytes/s, v5e
INT8_PEAK = 394.7e12      # int8 ops/s, v5e
FWD_GFLOP_PER_IMG = 4.09  # ResNet-50/224 conv+fc forward (2*MACs)
TRAIN_FLOP_MULT = 3.0     # fwd + dx + dW contractions


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audit", required=True,
                    help="fusion_audit.py --json output")
    ap.add_argument("--img_per_s", type=float, required=True)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--unroll", type=int, default=16)
    ap.add_argument("--json", default=os.path.join(
        _HERE, "roofline_r05.json"))
    args = ap.parse_args()

    with open(args.audit) as f:
        audit = json.load(f)
    rows = audit["rows"] if isinstance(audit, dict) else audit
    steps = (audit.get("steps", 4) if isinstance(audit, dict) else 4)
    total_ms = sum(r["ms_total"] for r in rows)
    total_gb = sum(r.get("gb_per_step", 0.0) for r in rows) * steps
    ms_per_step = total_ms / steps
    gb_per_step = total_gb / steps

    hbm_frac = (gb_per_step * 1e9) / (ms_per_step * 1e-3) / HBM_PEAK
    flops_per_step = (FWD_GFLOP_PER_IMG * 1e9 * TRAIN_FLOP_MULT
                      * args.batch)
    mxu_frac = flops_per_step / (ms_per_step * 1e-3) / INT8_PEAK

    out = {
        "batch": args.batch,
        "unroll": args.unroll,
        "img_per_s": args.img_per_s,
        "device_ms_per_step": round(ms_per_step, 3),
        "bytes_per_step_gb": round(gb_per_step, 3),
        "hbm_roofline_frac": round(hbm_frac, 3),
        "mxu_int8_frac": round(mxu_frac, 3),
        "hbm_peak_gbps": HBM_PEAK / 1e9,
        "int8_peak_tops": INT8_PEAK / 1e12,
        "note": "hbm frac = audit bytes_accessed over device time vs "
                "819 GB/s; mxu frac = analytic ResNet-50 training "
                "FLOPs (4.09 GFLOP/img fwd x3) vs 394.7 int8 TOP/s. "
                "The step is HBM-bound: the hbm frac is the "
                "ceiling-distance metric, the mxu frac the proof of "
                "why FLOP-oriented tuning is the wrong lever.",
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print("wrote", args.json)


if __name__ == "__main__":
    main()
