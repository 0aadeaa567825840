"""Headline benchmark: DFP-INT8 ResNet-50/224 training throughput per
chip vs the bf16-simulated-quantization baseline (BASELINE.md configs
4-5 shapes — the north-star metric's model family; CIFAR ResNet-20
numbers and the full engine ladder live in benchmarks/).

Measures the full train step (forward + quantized backward + range
controllers + SGD) and prints a JSON line:

    {"metric": ..., "value": images/sec/chip (int8 engine),
     "unit": "images/sec/chip", "vs_baseline": int8_ips / bf16sim_ips}

The line is emitted INCREMENTALLY so a wall-clock cap can never void
the whole run (round 2's driver capture timed out with zero output —
see VERDICT.md):

  1. the int8 headline config is measured first and a provisional line
     is printed immediately, with ``vs_baseline`` taken from the last
     recorded baseline measurement (benchmarks/headline_baseline.json,
     ``"baseline_source": "cached"``);
  2. if enough of the wall-clock budget remains (env
     ``LBT_BENCH_BUDGET_S``, default 420 s — sized for an external cap
     of ~10 min), the bf16-sim baseline is measured in-session and the
     final line re-printed with the measured ratio
     (``"baseline_source": "measured"``); the cache file is refreshed.

  Consumers should take the LAST JSON line.

Headline config: integer-code engine, single-round counter-hash
stochastic rounding ('hash1'), lean fused BatchNorm, controller cadence
8 with per-step warmup, bf16 activation carrier, conv activations at 8
bits (`conv_act_extra=0`, the a8 knob: every contraction runs int8 x
int8 -> int32 on the MXU and conv-input codes ship as s8 — promoted to
the headline in round 3 after the gap-sensitive certification ladder
put it within 0.23% of FP32, same band as the faithful config; 60-epoch
long-horizon runs in benchmarks/BENCH_NOTES.md).  Batch 128: the best
measured per-chip operating point.  Baseline: bf16 fake-quant
simulation with reference-grade PRNG noise at the same batch, i.e. the
reference semantics implemented straightforwardly on TPU.

Measurement notes (this environment tunnels a remote TPU): steps run in
lax.scan blocks per dispatch (per-call RPC would dominate), batches are
generated on device inside the block (the tunnel re-ships array
arguments every call) by the cheap counter hash — uniform [-1,1) like
reference-preprocessed images; jax.random.normal would bill ~19M
threefry+erfinv words of input-generation per step to the train step —
and timing is forced by a device->host readback
because ``block_until_ready`` on the axon backend returns early.  The
measurement body is imported from benchmarks/imagenet_bench.py so both
entry points share one compilation-cache entry.
"""

import dataclasses
import importlib.util
import json
import os
import time

_T0 = time.monotonic()
_HERE = os.path.dirname(os.path.abspath(__file__))
_BASELINE_CACHE = os.path.join(_HERE, "benchmarks", "headline_baseline.json")

_spec = importlib.util.spec_from_file_location(
    "imagenet_bench", os.path.join(_HERE, "benchmarks", "imagenet_bench.py"))
_ib = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_ib)  # sets jax compilation-cache config

from lbt_tpu.config import QuantConfig  # noqa: E402

BATCH = 128
# 16 steps per dispatch: at ~60 ms/step the tunnel's ~25 ms per-dispatch
# overhead is ~4.5% at unroll 8; 16 halves it (measured +3.5% img/s).
# Applied to BOTH legs, so vs_baseline stays an apples comparison.
UNROLL = 16
BUDGET_S = float(os.environ.get("LBT_BENCH_BUDGET_S", "420"))


def _measure(cfg):
    dt = _ib.measure(cfg, batch=BATCH, unroll=UNROLL, depth=50,
                     image=224, classes=1000)
    return BATCH / dt


def _emit(ips_int8, ips_sim, source):
    print(json.dumps({
        "metric": "resnet50_imagenet224_dfp_int8_train_throughput",
        "value": round(ips_int8, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_int8 / ips_sim, 3),
        "baseline_source": source,
    }), flush=True)


def main():
    headline = dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash1"),
        fused_bn=True, range_update_every=8, act_dtype="bf16",
        conv_act_extra=0)
    baseline = QuantConfig.uniform(8, engine="sim_bf16", noise_mode="prng")

    try:
        with open(_BASELINE_CACHE) as f:
            cached_sim = float(json.load(f)["img_per_s"])
    except Exception:
        cached_sim = None

    ips_int8 = _measure(headline)
    if cached_sim:
        _emit(ips_int8, cached_sim, "cached")
    t_int8 = time.monotonic() - _T0

    # The baseline program is the same model family at the same shapes:
    # its compile/upload/measure cost tracks the headline's.  Skip it only
    # when the remaining budget clearly can't cover a repeat of what the
    # headline cost (plus slack) — the provisional line then stands.
    remaining = BUDGET_S - (time.monotonic() - _T0)
    if remaining < 1.25 * t_int8 + 30 and cached_sim:
        return
    try:
        ips_sim = _measure(baseline)
    except Exception:
        if cached_sim:
            return
        raise
    _emit(ips_int8, ips_sim, "measured")
    try:
        with open(_BASELINE_CACHE, "w") as f:
            json.dump({
                "metric": "resnet50_imagenet224_sim_bf16_train_throughput",
                "img_per_s": round(ips_sim, 1), "batch": BATCH,
                "unroll": UNROLL,
                "note": "auto-refreshed by bench.py after an in-session "
                        "baseline measurement; seeded from the round-2 "
                        "measurement (benchmarks/BENCH_NOTES.md).",
            }, f, indent=1)
    except OSError:
        pass


if __name__ == "__main__":
    main()
