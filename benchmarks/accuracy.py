"""DFXP-vs-FP32 accuracy-gap measurement (BASELINE.md comparison
protocol: the reference publishes no numbers, so the gap is established
by running both configs under identical recipes).

    python benchmarks/accuracy.py --model CIFAR10_Resnet20 --epochs 20 \
        --n_train 10000

Writes benchmarks/accuracy_<model>.json with the per-config curves.
Falls back to the synthetic dataset when the real one is not cached
(this environment has no egress) — gaps on synthetic data are indicative
only, but the machinery is identical.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax as _jax
_jax.config.update("jax_compilation_cache_dir",
                   _os.path.expanduser("~/.cache/lbt_tpu_xla"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import argparse
import json
import os

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.data.datasets import load_dataset, make_augment
from lbt_tpu.models import build_model
from lbt_tpu.models.zoo import MODEL_DATASET
from lbt_tpu.train.trainer import Trainer
from lbt_tpu.utils.logging import get_logger


def run(model_name: str, bits: int, tc: TrainConfig, data, augment,
        engine: str, noise_mode: str = "prng",
        fused_bn: bool = False, bn_momentum: float = 0.99,
        eval_every: int = 1, conv_act_extra: int = 1,
        range_update_every: int = 1, act_dtype: str = "f32",
        noise_shared_axis0: bool = False,
        bn_residual_q16: bool = False,
        bits_w: int = 0, stem_s2d: bool = False,
        initial_exponent_g=None) -> dict:
    import dataclasses
    cfg = (QuantConfig.fp32() if bits >= 32
           else dataclasses.replace(
               QuantConfig.uniform(bits, engine=engine,
                                   noise_mode=noise_mode),
               fused_bn=fused_bn, conv_act_extra=conv_act_extra,
               range_update_every=range_update_every,
               act_dtype=act_dtype,
               noise_shared_axis0=noise_shared_axis0,
               bn_residual_q16=bn_residual_q16, stem_s2d=stem_s2d,
               initial_exponent_g=initial_exponent_g))
    if bits_w and bits < 32:
        # mixed scheme (BASELINE config 3): narrow weights, wider
        # activations/grads
        cfg = dataclasses.replace(cfg, bits_w=bits_w)
    # short-horizon runs need a faster BN EMA or eval sees stale running
    # stats (the reference's 0.999 is tuned for ~250k updates)
    cfg = dataclasses.replace(cfg, bn_momentum=bn_momentum)
    kw = {}
    nc = data.get("num_classes")
    if nc and nc != 10:
        # hard-mode synthetic datasets override the class count; only the
        # parameterized factories (resnet/vgg/imagenet) accept it — the
        # four fixed reference models are 10-class by construction
        kw["num_classes"] = nc
    xtr = data["train"][0]
    if model_name.startswith("Imagenet") and xtr.ndim == 4 \
            and xtr.shape[1] != 224:
        # dataset override (e.g. imagenet112): size the stem/head to the
        # actual data
        kw["image_size"] = int(xtr.shape[1])
    model = build_model(model_name, cfg, weight_decay=tc.weight_decay,
                        **kw)
    trainer = Trainer(model, tc, data, augment=augment,
                      logger=get_logger())
    curve = []
    for epoch in range(tc.n_epoch):
        trainer.train_epoch(epoch)
        # eval ships the whole test set through the device tunnel; on
        # remote chips evaluating every epoch can dominate wall-clock
        if (epoch + 1) % eval_every == 0 or epoch + 1 == tc.n_epoch:
            ev = trainer.evaluate()
            curve.append({"epoch": epoch + 1, **ev})
        trainer.epoch += 1
    return {"bits": bits, "engine": engine, "curve": curve,
            "final": curve[-1]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="CIFAR10_Resnet20")
    ap.add_argument("--dataset", default=None,
                    help="override the model's default dataset (e.g. "
                         "imagenet112 for stem-shaped certification "
                         "runs at tractable size)")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n_train", type=int, default=10000)
    ap.add_argument("--n_test", type=int, default=2000)
    # -- gap-sensitive "hard" generalization task (synthetic only) --
    # The default synthetic task saturates every config at ~1.0 top-1
    # (memorization of a high-SNR distribution) and cannot resolve the
    # 0.3% BASELINE criterion.  --hard lowers the class signal and
    # raises the class count so held-out accuracy is bounded by
    # estimation error from a small train set: FP32 lands mid-range and
    # narrow widths measurably degrade (see --ladder).
    ap.add_argument("--hard", action="store_true")
    ap.add_argument("--signal", type=float, default=0.25,
                    help="class-prototype amplitude vs unit sample noise "
                         "(hard mode)")
    ap.add_argument("--classes", type=int, default=100,
                    help="synthetic class count (hard mode)")
    ap.add_argument("--label_noise", type=float, default=0.0,
                    help="fraction of train labels flipped (hard mode)")
    # -- width ladder: FP32 + {8,6,4,2} bits x {sim,int8} engines + the
    # lean round-2/3 knob configs at 8 bits, one JSON gap table --
    ap.add_argument("--ladder", action="store_true")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--bits", type=int, nargs="*", default=[8, 32])
    ap.add_argument("--warmup_epochs", type=int, default=0)
    # None -> (epochs//2, 3*epochs//4); pass e.g. 80 120 140 for the
    # reference schedule (reference trainer.py:117-132)
    ap.add_argument("--lr_decay_epochs", type=int, nargs="*", default=None)
    ap.add_argument("--lr_decay_factor", type=float, default=0.1)
    ap.add_argument("--engine", default="int8")
    ap.add_argument("--noise_mode", default="prng")
    ap.add_argument("--fused_bn", action="store_true")
    ap.add_argument("--conv_act_extra", type=int, default=1)
    ap.add_argument("--range_update_every", type=int, default=1)
    ap.add_argument("--act_dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--noise_shared_axis0", action="store_true",
                    help="reference-faithful shared rounding noise "
                         "(noise shape X.shape[1:], reference "
                         "dynamic_fixed_point.py:36)")
    ap.add_argument("--bn_residual_q16", action="store_true",
                    help="bf16 quantized-input BN residuals "
                         "(QuantConfig.bn_residual_q16)")
    ap.add_argument("--initial_exponent_g", type=int, default=None,
                    help="cold-start exponent for gradient sites "
                         "(QuantConfig.initial_exponent_g; required for "
                         "ImageNet-scale models — see config.py)")
    ap.add_argument("--stem_s2d", action="store_true",
                    help="space-to-depth ImageNet stem "
                         "(QuantConfig.stem_s2d; no-op on CIFAR stems)")
    ap.add_argument("--tag", default="")
    ap.add_argument("--bn_momentum", type=float, default=0.99)
    ap.add_argument("--scan_steps", type=int, default=0,
                    help="K train steps per dispatch (lax.scan)")
    ap.add_argument("--eval_every", type=int, default=1,
                    help="evaluate every N epochs (final epoch always)")
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed (init/shuffle/noise streams); "
                         "the synthetic data draw stays fixed")
    ap.add_argument("--bits_w", type=int, default=0,
                    help="override the WEIGHT width (mixed schemes, e.g. "
                         "--bits 8 --bits_w 4 = BASELINE config 3)")
    args = ap.parse_args()
    for b in args.bits:
        if not 1 <= b <= 32:
            raise SystemExit(f"--bits entries must be 1..32, got {b}")

    ds = args.dataset or MODEL_DATASET[args.model]
    if args.hard:
        data = load_dataset(ds, n_train=args.n_train, n_test=args.n_test,
                            signal=args.signal,
                            override_classes=args.classes,
                            label_noise=args.label_noise)
        if not data["synthetic"]:
            raise SystemExit("--hard shapes the synthetic generator only; "
                             "real cached data was found")
    else:
        data = load_dataset(ds, n_train=args.n_train, n_test=args.n_test)
    augment = make_augment(ds)
    decay_epochs = (tuple(args.lr_decay_epochs)
                    if args.lr_decay_epochs is not None
                    else (args.epochs // 2, 3 * args.epochs // 4))
    tc = TrainConfig(
        lr=args.lr, batch_size=args.batch_size, n_epoch=args.epochs,
        lr_decay_epochs=decay_epochs,
        lr_decay_factor=args.lr_decay_factor,
        warmup_epochs=args.warmup_epochs,
        scan_steps=args.scan_steps,
        seed=args.seed,
        log_every=10_000,
    )
    results = {
        "model": args.model, "dataset": ds,
        "synthetic": bool(data["synthetic"]),
        "recipe": {"epochs": args.epochs, "lr": args.lr,
                   "batch_size": args.batch_size,
                   "n_train": args.n_train,
                   "lr_decay_epochs": list(decay_epochs),
                   "lr_decay_factor": args.lr_decay_factor,
                   "warmup_epochs": args.warmup_epochs,
                   "seed": args.seed,
                   "bn_momentum": args.bn_momentum},
        "runs": [],
    }
    if args.hard:
        results["hard"] = {"signal": args.signal, "classes": args.classes,
                           "label_noise": args.label_noise}

    if args.ladder:
        # The BASELINE.md protocol instrument: FP32 floor; every width
        # through BOTH engines at identical noise settings (sim vs int8 —
        # the integer-code path must reproduce the simulation's gap); the
        # round-2/3 lean knob configs at 8 bits (headline promotion
        # evidence, incl. conv_act_extra=0).
        jobs = [("fp32", dict(bits=32, engine="sim"))]
        for b in (8, 6, 4, 2):
            jobs.append((f"sim-{b}", dict(bits=b, engine="sim",
                                          noise_mode="hash")))
            jobs.append((f"int8-{b}", dict(bits=b, engine="int8",
                                           noise_mode="hash")))
        lean = dict(bits=8, engine="int8", noise_mode="hash1",
                    fused_bn=True, range_update_every=8, act_dtype="bf16")
        jobs.append(("int8-8-lean-h1", lean))
        jobs.append(("int8-8-lean-h1-a8", {**lean, "conv_act_extra": 0}))
        # mixed widths (BASELINE config 3 scheme): INT4 weights ride the
        # int8 path; activations/grads stay 8-bit
        jobs.append(("int8-w4a8", dict(bits=8, engine="int8",
                                       noise_mode="hash", bits_w=4)))
    else:
        jobs = [(f"bits{b}", dict(
            bits=b, engine=args.engine, noise_mode=args.noise_mode,
            fused_bn=args.fused_bn, conv_act_extra=args.conv_act_extra,
            range_update_every=args.range_update_every,
            act_dtype=args.act_dtype,
            noise_shared_axis0=args.noise_shared_axis0,
            bn_residual_q16=args.bn_residual_q16,
            bits_w=args.bits_w, stem_s2d=args.stem_s2d,
            initial_exponent_g=args.initial_exponent_g))
            for b in args.bits]

    for name, kw in jobs:
        r = run(args.model, kw.pop("bits"), tc, data, augment,
                kw.pop("engine"), bn_momentum=args.bn_momentum,
                eval_every=args.eval_every, **kw)
        r["config"] = name
        r.update(kw)
        print(f"{name}: final top-1 {r['final']['accuracy']:.4f} "
              f"loss {r['final']['loss']:.4f}", flush=True)
        results["runs"].append(r)

    accs = {r["config"]: r["final"]["accuracy"] for r in results["runs"]}
    fp32_acc = accs.get("fp32", accs.get("bits32"))
    if fp32_acc is not None:
        results["gaps_vs_fp32"] = {
            name: round(fp32_acc - a, 4) for name, a in accs.items()
            if name not in ("fp32", "bits32")}
    suffix = f"_{args.tag}" if args.tag else ""
    out = os.path.join(os.path.dirname(__file__),
                       f"accuracy_{args.model}{suffix}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
