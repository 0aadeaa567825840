"""Consolidate the bs128 certification seed campaign into one artifact.

Round-5 seed-robustness pass (VERDICT round-4 #4): the bs128
certifications (faithful int8 @ 64 ep, lean-a8 headline @ 96 ep, both
with the 2-epoch LR warmup recipe) are repeated at seeds 1-2 on top of
the round-4 seed-0 runs (p9/p11) and summarized as per-seed paired gaps
vs the same-seed FP32 control, with mean and sample sigma.  bench.py
reads the output (cert_bs128_seeds.json) in preference to the
single-seed artifacts.

Usage: python benchmarks/cert_bs128_band.py
"""

import json
import math
import os

_HERE = os.path.dirname(os.path.abspath(__file__))


def _final(run):
    return float(run["curve"][-1]["accuracy"])


def _runs_by_config(path):
    with open(path) as f:
        d = json.load(f)
    return d, {r.get("config"): r for r in d["runs"]}


def main():
    seeds = {}
    # seed 0 = the round-4 p9 (fp32 + faithful, 64 ep) / p11 (a8, 96 ep)
    d9, r9 = _runs_by_config(os.path.join(
        _HERE, "accuracy_CIFAR10_Resnet20_hard_cert_bs128_p9.json"))
    d11, r11 = _runs_by_config(os.path.join(
        _HERE, "accuracy_CIFAR10_Resnet20_hard_cert_bs128_p11.json"))
    seeds[0] = {"fp32": _final(r9["bits32"]),
                "faithful_int8": _final(r9["bits8"]),
                "lean_a8": _final(r11["bits8"]),
                "config_rows": {"faithful": r9["bits8"],
                                "headline": r11["bits8"]}}
    for s in (1, 2):
        base = os.path.join(
            _HERE, f"accuracy_CIFAR10_Resnet20_bs128cert_s{s}.json")
        a8 = os.path.join(
            _HERE, f"accuracy_CIFAR10_Resnet20_bs128cert_a8_s{s}.json")
        if not (os.path.exists(base) and os.path.exists(a8)):
            print(f"seed {s}: artifacts missing, skipped")
            continue
        db, rb = _runs_by_config(base)
        da, ra = _runs_by_config(a8)
        seeds[s] = {"fp32": _final(rb["bits32"]),
                    "faithful_int8": _final(rb["bits8"]),
                    "lean_a8": _final(ra["bits8"]),
                    "config_rows": {"faithful": rb["bits8"],
                                    "headline": ra["bits8"]}}

    out = {"seeds": {}, "recipe": {
        "batch_size": 128, "epochs_faithful": 64, "epochs_headline": 96,
        "warmup_epochs": 2, "note": "hard task signal 0.9, 100 classes, "
        "n_train 10000, lr 0.01 x0.1 @ {1/2, 3/4} of the horizon, "
        "bn_momentum 0.99; gaps are per-seed PAIRED vs the same-seed "
        "FP32 control at 64 ep"}}
    gaps_f, gaps_a = [], []
    for s, v in sorted(seeds.items()):
        gf = v["fp32"] - v["faithful_int8"]
        ga = v["fp32"] - v["lean_a8"]
        gaps_f.append(gf)
        gaps_a.append(ga)
        out["seeds"][str(s)] = {
            "fp32": v["fp32"], "faithful_int8": v["faithful_int8"],
            "lean_a8": v["lean_a8"],
            "gap_faithful": round(gf, 4), "gap_headline_a8": round(ga, 4)}

    def band(xs):
        m = sum(xs) / len(xs)
        sd = (math.fsum((x - m) ** 2 for x in xs)
              / max(len(xs) - 1, 1)) ** 0.5
        return {"mean": round(m, 4), "sigma": round(sd, 4),
                "max": round(max(xs), 4), "n_seeds": len(xs)}

    out["gap_faithful_int8"] = band(gaps_f)
    out["gap_headline_a8"] = band(gaps_a)
    # record the headline arm's config knobs for bench.py validation
    hr = seeds[0]["config_rows"]["headline"]
    out["headline_config"] = {
        k: hr.get(k) for k in ("bits", "engine", "noise_mode", "fused_bn",
                               "range_update_every", "act_dtype",
                               "conv_act_extra")}
    crit = 0.003
    out["criterion"] = {
        "threshold": crit,
        "faithful_pass": abs(out["gap_faithful_int8"]["mean"]) +
        2 * out["gap_faithful_int8"]["sigma"] <= crit,
        "headline_pass": abs(out["gap_headline_a8"]["mean"]) +
        2 * out["gap_headline_a8"]["sigma"] <= crit,
        "note": "|mean| + 2 sigma vs the 0.3% BASELINE criterion"}
    path = os.path.join(_HERE, "cert_bs128_seeds.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k in ("gap_faithful_int8", "gap_headline_a8",
                               "criterion")}, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
