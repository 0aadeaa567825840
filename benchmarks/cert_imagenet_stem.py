"""Consolidate the ImageNet-stem (imagenet112) certification arms into
one artifact, benchmarks/cert_imagenet_stem.json.

The campaign (round 5) answers two questions the CIFAR-based bs128
certification cannot:

1. does DFXP-8 hold its accuracy on an ImageNet-stem model at all
   (it requires the grad cold-start fix, QuantConfig.initial_exponent_g
   — see BENCH_NOTES round-5 chapter), and
2. does the opt-in space-to-depth stem (QuantConfig.stem_s2d) cost
   accuracy relative to the same lean-a8 config with the 7x7/s2 stem —
   the gate for promoting stem_s2d into the bench.py headline.

Arms (benchmarks/accuracy.py, Imagenet_Resnet18 / imagenet112
synthetic, 24 epochs, lr decay 12/18, bs 64, initial_exponent_g=-10):
fp32 control, faithful int8-8, lean-a8, lean-a8 + stem_s2d.

    python benchmarks/cert_imagenet_stem.py
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
CRITERION = 0.003  # the BASELINE.md 0.3% gap criterion

ARMS = {
    "fp32": "accuracy_Imagenet_Resnet18_s2d24_fp32.json",
    "faithful_int8": "accuracy_Imagenet_Resnet18_s2d24_faithful.json",
    "lean_a8": "accuracy_Imagenet_Resnet18_s2d24_nos2d.json",
    "lean_a8_s2d": "accuracy_Imagenet_Resnet18_s2d24_s2d.json",
}


def main():
    finals, curves, recipes, run_cfgs = {}, {}, {}, {}
    for arm, fname in ARMS.items():
        path = os.path.join(HERE, fname)
        if not os.path.exists(path):
            print(f"missing arm {arm}: {fname} — run the campaign first")
            return
        with open(path) as f:
            d = json.load(f)
        run = d["runs"][0]
        finals[arm] = run["final"]["accuracy"]
        curves[arm] = [(c["epoch"], round(c["accuracy"], 4))
                       for c in run["curve"]]
        recipes[arm] = d["recipe"]
        run_cfgs[arm] = {k: run.get(k) for k in (
            "engine", "noise_mode", "fused_bn", "range_update_every",
            "act_dtype", "conv_act_extra", "stem_s2d",
            "initial_exponent_g")}

    fp32 = finals["fp32"]
    gaps = {a: round(fp32 - v, 4) for a, v in finals.items() if a != "fp32"}
    s2d_delta = round(finals["lean_a8"] - finals["lean_a8_s2d"], 4)

    out = {
        "model": "Imagenet_Resnet18",
        "dataset": "imagenet112 (synthetic prototype task)",
        "recipe": recipes["fp32"],
        "finals": {a: round(v, 4) for a, v in finals.items()},
        "curves": curves,
        "gaps_vs_fp32": gaps,
        "s2d_vs_nos2d_delta": s2d_delta,
        "criterion": CRITERION,
        "certifies": {
            "faithful_int8": gaps["faithful_int8"] <= CRITERION,
            "lean_a8": gaps["lean_a8"] <= CRITERION,
            "stem_s2d_promotion": s2d_delta <= CRITERION,
        },
        # bench.py validates the lean arm's knobs against its headline
        # config before quoting these numbers
        "headline_config": run_cfgs["lean_a8"],
        "s2d_config": run_cfgs["lean_a8_s2d"],
        "note": "requires initial_exponent_g=-10: the reference grad "
                "cold start diverges at this scale (BENCH_NOTES round-5 "
                "'grad-exponent cold start').",
    }
    path = os.path.join(HERE, "cert_imagenet_stem.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["finals"], indent=1))
    print("gaps_vs_fp32:", gaps, "s2d_delta:", s2d_delta)
    print("wrote", path)


if __name__ == "__main__":
    main()
