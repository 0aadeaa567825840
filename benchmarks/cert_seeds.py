"""Multi-seed variance bands for the certification table (round-4
VERDICT item 3: the 0.16-0.26% DFXP-8 gaps were point estimates with a
two-seed spread of the same magnitude — convert the 0.3% BASELINE
verdict into a confidence statement).

Runs the certification-point recipe (hard task, signal 0.9, bs32,
lr 0.01, 16 epochs — the operating point of
accuracy_CIFAR10_Resnet20_hard_cert.json) for each config x seed,
reusing benchmarks/accuracy.py in-process, then writes
accuracy_CIFAR10_Resnet20_cert_seeds.json with per-config mean, sigma,
and the |mean gap| + 2 sigma criterion check against 0.3%.

Usage: python benchmarks/cert_seeds.py [--seeds 0 1 2 3 4]
       [--configs fp32 int8-8 lean-h1 lean-a8]
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lbt_tpu.config import TrainConfig
from lbt_tpu.data.datasets import load_dataset, make_augment

_HERE = os.path.dirname(os.path.abspath(__file__))

# config name -> accuracy.run kwargs (matches the hard_cert ladder rows)
CONFIGS = {
    "fp32": dict(bits=32, engine="sim"),
    "sim-8": dict(bits=8, engine="sim", noise_mode="hash"),
    "int8-8": dict(bits=8, engine="int8", noise_mode="hash"),
    "lean-h1": dict(bits=8, engine="int8", noise_mode="hash1",
                    fused_bn=True, range_update_every=8,
                    act_dtype="bf16"),
    "lean-a8": dict(bits=8, engine="int8", noise_mode="hash1",
                    fused_bn=True, range_update_every=8,
                    act_dtype="bf16", conv_act_extra=0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2, 3, 4])
    ap.add_argument("--configs", nargs="*",
                    default=["fp32", "int8-8", "lean-h1", "lean-a8"])
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--signal", type=float, default=0.9)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--n_train", type=int, default=10000)
    ap.add_argument("--json", default=os.path.join(
        _HERE, "accuracy_CIFAR10_Resnet20_cert_seeds.json"))
    args = ap.parse_args()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "accuracy", os.path.join(_HERE, "accuracy.py"))
    acc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(acc)

    data = load_dataset("cifar10", n_train=args.n_train, n_test=2000,
                        signal=args.signal, override_classes=100)
    assert data["synthetic"]
    augment = make_augment("cifar10")
    decay = (args.epochs // 2, 3 * args.epochs // 4)

    out = {"recipe": {"epochs": args.epochs, "signal": args.signal,
                      "batch_size": args.batch_size, "lr": args.lr,
                      "n_train": args.n_train,
                      "lr_decay_epochs": list(decay)},
           "per_run": {}, "bands": {}}
    finals = {}
    for name in args.configs:
        kw = dict(CONFIGS[name])
        bits = kw.pop("bits")
        engine = kw.pop("engine")
        finals[name] = []
        for seed in args.seeds:
            tc = TrainConfig(lr=args.lr, batch_size=args.batch_size,
                             n_epoch=args.epochs,
                             lr_decay_epochs=decay, seed=seed,
                             log_every=10_000,
                             # 16-step scan blocks: identical trajectory
                             # (same PRNG derivations), ~10x fewer tunnel
                             # dispatches on the remote chip
                             scan_steps=16)
            r = acc.run("CIFAR10_Resnet20", bits, tc, data, augment,
                        engine, bn_momentum=0.99, eval_every=4, **kw)
            a = r["final"]["accuracy"]
            finals[name].append(a)
            out["per_run"][f"{name}/s{seed}"] = round(a, 4)
            print(f"{name} seed {seed}: top-1 {a:.4f}", flush=True)
            with open(args.json, "w") as f:
                json.dump(out, f, indent=1)

    fp32 = finals.get("fp32")
    for name, accs in finals.items():
        n = len(accs)
        mean = sum(accs) / n
        sig = math.sqrt(sum((a - mean) ** 2 for a in accs) / max(n - 1, 1))
        band = {"mean": round(mean, 4), "sigma": round(sig, 4), "n": n}
        if fp32 and name != "fp32":
            # paired per-seed gaps (same seed's fp32 run as the floor)
            gaps = [f - a for f, a in zip(fp32, accs)]
            gm = sum(gaps) / n
            gs = math.sqrt(sum((g - gm) ** 2 for g in gaps)
                           / max(n - 1, 1))
            band.update({
                "gap_mean": round(gm, 4), "gap_sigma": round(gs, 4),
                "gap_mean_plus_2sigma": round(gm + 2 * gs, 4),
                "within_0.3pct_at_2sigma": bool(abs(gm) + 2 * gs < 0.003),
            })
        out["bands"][name] = band
        print(f"{name}: {band}", flush=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.json, flush=True)


if __name__ == "__main__":
    main()
