"""Headline benchmark: DFP-INT8 ResNet-50/224 training throughput per
chip vs the bf16-simulated-quantization baseline (BASELINE.md configs
4-5 shapes — the north-star metric's model family; CIFAR ResNet-20
numbers and the full engine ladder live in benchmarks/).

Measures the full train step (forward + quantized backward + range
controllers + SGD) and prints a JSON line:

    {"metric": ..., "value": images/sec/chip (int8 engine),
     "unit": "images/sec/chip", "vs_baseline": int8_ips / bf16sim_ips}

Exactly ONE JSON line is printed on every exit path (round 2's driver
capture timed out with zero output; round 3's two-line contract risked
a first-line consumer reading the stale ratio — see VERDICT.md/ADVICE):

  1. the int8 headline config is measured first; a provisional line
     (``vs_baseline`` from the last recorded baseline measurement in
     benchmarks/headline_baseline.json, ``"baseline_source": "cached"``,
     self-describing via ``baseline_age_s``) is HELD, and flushed only
     if the measured leg is skipped, fails, or the process receives
     SIGTERM/SIGINT from a wall-clock cap;
  2. if enough of the wall-clock budget remains (env
     ``LBT_BENCH_BUDGET_S``, default 420 s — sized for an external cap
     of ~10 min), the bf16-sim baseline is measured in-session and the
     single final line carries the measured ratio
     (``"baseline_source": "measured"``); the cache file is refreshed.

  The cached denominator is validated against the current BATCH/UNROLL
  constants (stamped in the cache file) and ignored on mismatch.

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
import signal
import sys
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


# Certification artifacts (round-4 bs128 campaign; BENCH_NOTES "bs128
# certification").  p9 holds the FP32 control + faithful-int8 arm; the
# headline (lean-a8) arm lives in the seed files written by
# benchmarks/cert_seeds.py (p11 = seed 0).  Gaps are DERIVED from these
# at emit time and voided if the recorded run config no longer matches
# the headline QuantConfig (advisor round 4: hardcoded constants go
# silently stale).
_CERT_BASE = os.path.join(
    _HERE, "benchmarks", "accuracy_CIFAR10_Resnet20_hard_cert_bs128_p9.json")
_CERT_HEADLINE = os.path.join(
    _HERE, "benchmarks", "accuracy_CIFAR10_Resnet20_hard_cert_bs128_p11.json")
# Faithful-quantization-sites throughput, recorded (not re-measured per
# run — BENCH_NOTES round 5 "faithful-config 3x question settled").
_FAITHFUL_REC = os.path.join(_HERE, "benchmarks", "faithful_r05.json")
# Roofline fractions of the headline step, recorded from the round-5
# steady-state fusion audit (benchmarks/roofline.py).
_ROOFLINE_REC = os.path.join(_HERE, "benchmarks", "roofline_r05.json")


_CERT_SEEDS = os.path.join(_HERE, "benchmarks", "cert_bs128_seeds.json")
# Round-5 ImageNet-stem certification (benchmarks/cert_imagenet_stem.py):
# DFXP-8 accuracy on an ImageNet-stem model (needs initial_exponent_g
# against the grad cold-start collapse, BENCH_NOTES round 5) and the
# stem_s2d promotion gate for the headline measurement.
_CERT_IMSTEM = os.path.join(_HERE, "benchmarks", "cert_imagenet_stem.json")


def _imagenet_stem_fields(headline_cfg):
    """Recorded ImageNet-stem certification gaps + the s2d promotion
    verdict.  Voided (and promotion withheld) unless the artifact's
    lean arm ran the current headline knobs."""
    try:
        with open(_CERT_IMSTEM) as f:
            d = json.load(f)
        hc = d["headline_config"]
        if not (hc.get("engine") == headline_cfg.engine
                and hc.get("noise_mode") == headline_cfg.noise_mode
                and bool(hc.get("fused_bn")) == bool(headline_cfg.fused_bn)
                and int(hc.get("range_update_every", -1))
                == int(headline_cfg.range_update_every)
                and hc.get("act_dtype") == headline_cfg.act_dtype
                and int(hc.get("conv_act_extra", -1))
                == int(headline_cfg.conv_act_extra)):
            return {"cert_imstem_config_match": False}, False
        out = {
            "cert_imstem_gap_faithful": d["gaps_vs_fp32"]["faithful_int8"],
            "cert_imstem_gap_headline_a8": d["gaps_vs_fp32"]["lean_a8"],
            "cert_imstem_s2d_delta": d["s2d_vs_nos2d_delta"],
            "cert_imstem_initial_exponent_g": hc.get("initial_exponent_g"),
        }
        return out, bool(d["certifies"].get("stem_s2d_promotion"))
    except Exception:
        return {}, False


def _cert_gaps_banded(headline_cfg):
    """Seed-banded gaps from the round-5 campaign (preferred source).

    Returns None when the artifact is missing or its recorded headline
    knobs no longer match the benched config."""
    try:
        with open(_CERT_SEEDS) as f:
            d = json.load(f)
        hc = d["headline_config"]
        if not (int(hc.get("bits", -1)) == 8
                and hc.get("engine") == headline_cfg.engine
                and hc.get("noise_mode") == headline_cfg.noise_mode
                and bool(hc.get("fused_bn")) == bool(headline_cfg.fused_bn)
                and int(hc.get("range_update_every", -1))
                == int(headline_cfg.range_update_every)
                and hc.get("act_dtype") == headline_cfg.act_dtype
                and int(hc.get("conv_act_extra", -1))
                == int(headline_cfg.conv_act_extra)
                and int(d["recipe"]["batch_size"]) == BATCH):
            return None
        return {
            "cert_bs128_gap_faithful_int8": d["gap_faithful_int8"]["mean"],
            "cert_bs128_gap_headline_a8": d["gap_headline_a8"]["mean"],
            "cert_bs128_gap_sigma": d["gap_headline_a8"]["sigma"],
            "cert_bs128_n_seeds": d["gap_headline_a8"]["n_seeds"],
        }
    except Exception:
        return None


def _cert_gaps(headline_cfg):
    """Read the recorded bs128 certification gaps vs FP32.

    Prefers the seed-banded campaign artifact
    (benchmarks/cert_bs128_seeds.json); falls back to the round-4
    single-seed artifacts.  Returns emit fields only when the artifacts
    exist AND the headline arm's recorded knobs match the current
    headline config (otherwise the certification no longer covers the
    benched operating point and the fields are replaced by an explicit
    staleness marker).
    """
    banded = _cert_gaps_banded(headline_cfg)
    if banded is not None:
        out = banded
        out.update(_faithful_recorded())
        return out
    out = {}
    try:
        with open(_CERT_BASE) as f:
            base = json.load(f)
        runs = {r.get("config"): r for r in base["runs"]}
        fp32 = float(runs["bits32"]["curve"][-1]["accuracy"])
        faithful = float(runs["bits8"]["curve"][-1]["accuracy"])
        if int(base["recipe"]["batch_size"]) == BATCH:
            out["cert_bs128_gap_faithful_int8"] = round(fp32 - faithful, 4)
        with open(_CERT_HEADLINE) as f:
            head = json.load(f)
        run = head["runs"][0]
        matches = (
            int(run.get("bits", -1)) == 8
            and run.get("engine") == headline_cfg.engine
            and run.get("noise_mode") == headline_cfg.noise_mode
            and bool(run.get("fused_bn")) == bool(headline_cfg.fused_bn)
            and int(run.get("range_update_every", -1))
            == int(headline_cfg.range_update_every)
            and run.get("act_dtype") == headline_cfg.act_dtype
            and int(run.get("conv_act_extra", -1))
            == int(headline_cfg.conv_act_extra)
            and int(head["recipe"]["batch_size"]) == BATCH)
        if matches:
            out["cert_bs128_gap_headline_a8"] = round(
                fp32 - float(run["curve"][-1]["accuracy"]), 4)
        else:
            out["cert_headline_config_match"] = False
    except Exception:
        out["cert_artifacts"] = "unavailable"
    out.update(_faithful_recorded())
    return out


def _faithful_recorded():
    out = {}
    try:
        with open(_FAITHFUL_REC) as f:
            rec = json.load(f)
        if (int(rec.get("batch", -1)) == BATCH
                and int(rec.get("unroll", -1)) == UNROLL):
            out["faithful_vs_baseline_recorded"] = float(
                rec["vs_baseline"])
    except Exception:
        pass
    try:
        with open(_ROOFLINE_REC) as f:
            rl = json.load(f)
        if int(rl.get("batch", -1)) == BATCH:
            out["hbm_roofline_frac"] = float(rl["hbm_roofline_frac"])
            out["mxu_int8_frac"] = float(rl["mxu_int8_frac"])
    except Exception:
        pass
    return out


_CERT_FIELDS = {}


def _emit(ips_int8, ips_sim, source, extra=None):
    line = {
        "metric": "resnet50_imagenet224_dfp_int8_train_throughput",
        "value": round(ips_int8, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_int8 / ips_sim, 3),
        "baseline_source": source,
    }
    line.update(_CERT_FIELDS)
    line.update(extra or {})
    print(json.dumps(line), flush=True)


class _Fallback:
    """Guarantees exactly ONE stdout JSON line on every exit path.

    Round 2's driver capture timed out with zero output; round 3 fixed
    that by printing a provisional cached-ratio line first, but that
    left two lines on stdout when the measured leg also ran (advisor
    round 3: a first-line consumer would read the stale ratio).  Now the
    provisional line is *held* and only flushed if the final measured
    line can't be produced — including on SIGTERM/SIGINT (external
    wall-clock caps send TERM), via handlers installed here.  Only
    SIGKILL can still void the run.
    """

    def __init__(self):
        self.pending = None
        self.done = False
        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, self._on_signal)

    def arm(self, ips_int8, ips_sim, extra):
        self.pending = (ips_int8, ips_sim, extra)

    def flush(self):
        if self.done:
            return
        self.done = True
        if self.pending is not None:
            _emit(self.pending[0], self.pending[1], "cached",
                  self.pending[2])

    def finalize(self, ips_int8, ips_sim):
        self.done = True
        _emit(ips_int8, ips_sim, "measured")

    def _on_signal(self, signum, frame):
        self.flush()
        sys.exit(128 + signum)


def main():
    headline = dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash1"),
        fused_bn=True, range_update_every=8, act_dtype="bf16",
        conv_act_extra=0)
    baseline = QuantConfig.uniform(8, engine="sim_bf16", noise_mode="prng")
    _CERT_FIELDS.update(_cert_gaps(headline))
    imstem_fields, s2d_certified = _imagenet_stem_fields(headline)
    _CERT_FIELDS.update(imstem_fields)
    if s2d_certified:
        # promotion gate: only measure with the MLPerf s2d stem when the
        # ImageNet-stem campaign certified it against the same lean-a8
        # config (perf and accuracy share an operating point)
        headline = dataclasses.replace(headline, stem_s2d=True)
        _CERT_FIELDS["stem_s2d"] = True

    try:
        with open(_BASELINE_CACHE) as f:
            _cache = json.load(f)
        cached_sim = float(_cache["img_per_s"])
        # The cached denominator is only valid at the same operating
        # point.  A constant bump (e.g. UNROLL 8->16 in round 3) must
        # invalidate the cache and force an in-session measurement —
        # otherwise the ratio silently mixes operating points.
        if int(_cache.get("batch", -1)) != BATCH or \
                int(_cache.get("unroll", -1)) != UNROLL:
            cached_sim = None
        cached_age = _cache.get("age_rounds", 0)
    except Exception:
        cached_sim, cached_age = None, None

    fb = _Fallback()
    ips_int8 = _measure(headline)
    if cached_sim:
        age_s = None
        if _cache.get("measured_at"):
            age_s = round(time.time() - float(_cache["measured_at"]))
        fb.arm(ips_int8, cached_sim,
               {"baseline_age_rounds": cached_age,
                "baseline_age_s": age_s})
    t_int8 = time.monotonic() - _T0

    # The baseline program is the same model family at the same shapes:
    # its compile/upload/measure cost tracks the headline's.  Skip it only
    # when the remaining budget clearly can't cover a repeat of what the
    # headline cost (plus slack) — the provisional line then stands.
    remaining = BUDGET_S - (time.monotonic() - _T0)
    if remaining < 1.25 * t_int8 + 30 and cached_sim:
        fb.flush()
        return
    try:
        ips_sim = _measure(baseline)
    except Exception:
        if cached_sim:
            fb.flush()
            return
        raise
    fb.finalize(ips_int8, ips_sim)
    try:
        with open(_BASELINE_CACHE, "w") as f:
            json.dump({
                "metric": "resnet50_imagenet224_sim_bf16_train_throughput",
                "img_per_s": round(ips_sim, 1), "batch": BATCH,
                "unroll": UNROLL,
                "age_rounds": 0, "measured_at": time.time(),
                "note": "auto-refreshed by bench.py after an in-session "
                        "baseline measurement; batch/unroll stamped for "
                        "cache validation (a mismatch with the current "
                        "constants voids the cache).",
            }, f, indent=1)
    except OSError:
        pass


if __name__ == "__main__":
    main()
