"""Experiment CLI.

Mirrors the reference driver (reference main.py:106-166) with every
formerly dead or hard-coded knob made real (SURVEY.md §5.6): separate
per-tensor-class bit-widths, target overflow rate, LR decay schedule,
engine selection, faithful-mode toggles, checkpoint/resume, and
data-parallel execution.

Example:
    python main.py --model CIFAR10_Resnet20 --bits 8 --n_epoch 160
    python main.py --model CIFAR10_VGG --bits_w 4 --bits_a 8 --bits_g 8
"""

import argparse
import datetime
import json
import os

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.data.datasets import load_dataset, make_augment
from lbt_tpu.models import build_model
from lbt_tpu.models.zoo import MODEL_DATASET, MODEL_REGISTRY
from lbt_tpu.train.trainer import Trainer
from lbt_tpu.utils.logging import get_logger


def parse_args():
    p = argparse.ArgumentParser(description="DFXP low-bit training on TPU")
    p.add_argument("--exp_path", type=str, default=None)
    p.add_argument("--model", type=str, default="CIFAR10_Resnet20",
                   choices=sorted(MODEL_REGISTRY))
    # quantization (reference --bits, plus per-class widths)
    p.add_argument("--bits", type=int, default=8,
                   help="uniform bit-width (32 = fp32 passthrough)")
    p.add_argument("--bits_w", type=int, default=None)
    p.add_argument("--bits_a", type=int, default=None)
    p.add_argument("--bits_g", type=int, default=None)
    p.add_argument("--engine", type=str, default="int8",
                   choices=["sim", "sim_bf16", "int8", "pallas"])
    p.add_argument("--target_overflow_rate", type=float, default=0.0)
    p.add_argument("--deterministic_rounding", action="store_true",
                   help="round-to-nearest-even instead of stochastic")
    p.add_argument("--noise_mode", type=str, default="prng",
                   choices=["prng", "hash", "hash1"],
                   help="stochastic-rounding noise source: jax.random "
                        "threefry ('prng'), the fused counter hash "
                        "('hash', ~2x faster), or the single-round "
                        "hash ('hash1', fastest; "
                        "benchmarks/BENCH_NOTES.md)")
    p.add_argument("--conv_act_extra", type=int, default=1,
                   help="extra bits for conv activations over --bits_a "
                        "(reference quantizes conv acts at bits+1, "
                        "dynamic_fixed_point.py:288; 0 = lean mode where "
                        "8-bit conv acts ride the int8 MXU path)")
    p.add_argument("--fused_bn", action="store_true",
                   help="lean fused BatchNorm: one input quantization + "
                        "one cotangent barrier (divergence from "
                        "reference's norm+rescale double quantization)")
    p.add_argument("--act_dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="inter-layer activation carrier dtype; 'bf16' "
                        "halves activation/cotangent HBM traffic (math "
                        "stays f32; <=9-bit DFXP grids are exact in "
                        "bf16 — see QuantConfig.act_dtype)")
    p.add_argument("--bn_residual_q16", action="store_true",
                   help="store BN backward residuals as the quantized "
                        "input at bf16 + batch moments (replay only the "
                        "elementwise normalize in backward); cuts "
                        "backward HBM traffic, math unchanged")
    p.add_argument("--remat_bn", action="store_true",
                   help="fully rematerialize BN in backward (memory "
                        "knob; recomputes batch moments — slower than "
                        "bn_residual_q16, see BENCH_NOTES)")
    p.add_argument("--initial_exponent_g", type=int, default=None,
                   help="cold-start exponent for the gradient sites only "
                        "(QuantConfig.initial_exponent_g; e.g. -10 for "
                        "ImageNet-scale models — the reference default 2 "
                        "makes the early walk-down inject LSB-scale "
                        "gradient noise, see config.py)")
    p.add_argument("--stem_s2d", action="store_true",
                   help="space-to-depth ImageNet stem "
                        "(QuantConfig.stem_s2d; no-op on CIFAR stems)")
    p.add_argument("--range_update_every", type=int, default=1,
                   help="run the DFXP range controllers every K-th step "
                        "(1 = reference cadence; larger K skips most of "
                        "the overflow-reduction cost, see "
                        "benchmarks/BENCH_NOTES.md)")
    p.add_argument("--bn_momentum", type=float, default=0.999,
                   help="BN running-stats EMA momentum (reference 0.999; "
                        "lower for short runs or eval sees stale stats)")
    # faithful-mode quirk toggles (SURVEY.md §7)
    p.add_argument("--faithful_eval", action="store_true")
    p.add_argument("--noise_shared_axis0", action="store_true")
    p.add_argument("--reset_momentum_on_decay", action="store_true")
    # training (reference defaults, main.py:112-122)
    p.add_argument("--dropout", type=float, default=0.5,
                   help="dropout KEEP probability")
    p.add_argument("--weight_decay", type=float, default=2e-4)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--lr_decay_factor", type=float, default=0.1)
    p.add_argument("--lr_decay_epochs", type=int, nargs="*",
                   default=[80, 120, 140])
    p.add_argument("--warmup_epochs", type=int, default=0)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--n_epoch", type=int, default=160)
    p.add_argument("--seed", type=int, default=0)
    # data / scale
    p.add_argument("--n_train", type=int, default=0)
    p.add_argument("--n_test", type=int, default=0)
    p.add_argument("--data_dir", type=str, default=None,
                   help="stream real data from an ImageFolder tree "
                        "(<dir>/train/<class>/*.jpeg, optional "
                        "<dir>/val/...) instead of the packaged/"
                        "synthetic arrays — decode + RandomResizedCrop/"
                        "flip on host threads (data/imagefolder.py)")
    p.add_argument("--tfrecord_train", type=str, default=None,
                   help="stream training data from TFRecord shards "
                        "(glob pattern) through the native C++ pipeline "
                        "(record framing -> tf.Example parse -> libjpeg "
                        "decode -> augment; data/tfrecord.py); requires "
                        "--num_classes")
    p.add_argument("--tfrecord_val", type=str, default=None,
                   help="TFRecord shards (glob) for evaluation")
    p.add_argument("--num_classes", type=int, default=None,
                   help="label count for --tfrecord_train data")
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--checkpoint_every", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of this many steps")
    p.add_argument("--native_loader", action="store_true",
                   help="use the C++ input pipeline (native/loader.cc)")
    p.add_argument("--log_every", type=int, default=100,
                   help="log train metrics every N batches")
    p.add_argument("--scan_steps", type=int, default=0,
                   help="run K train steps per dispatch via lax.scan "
                        "(amortizes RPC latency on remote devices; "
                        "identical trajectory to per-step dispatch)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--debug_nans", action="store_true",
                   help="jax_debug_nans: fail fast on NaN/Inf anywhere")
    p.add_argument("--lowbit_allreduce", action="store_true",
                   help="DFXP-int8 error-feedback gradient all-reduce "
                        "(implies --data_parallel)")
    p.add_argument("--lowbit_wire", type=str, default=None,
                   choices=["int16", "int8"],
                   help="use the explicit ppermute ring collective at "
                        "this wire width instead of the psum transport")
    p.add_argument("--gradient_buffer", action="store_true",
                   help="insert error-feedback GradientBuffers at the "
                        "reference's ResNet sites")
    return p.parse_args()


def main():
    args = parse_args()
    for name in ("bits", "bits_w", "bits_a", "bits_g"):
        v = getattr(args, name)
        if v is not None and not (1 <= v <= 32):
            raise SystemExit(
                f"--{name} must be in 1..32 (32 = fp32 passthrough), "
                f"got {v}")
    # persistent XLA compilation cache: repeated runs skip the multi-minute
    # compile of the train step
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/lbt_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    exp = args.exp_path or os.path.join(
        "experiments",
        datetime.datetime.now().strftime("%m-%d-%H%M%S") + "-" + args.model)
    os.makedirs(exp, exist_ok=True)
    logger = get_logger(os.path.join(exp, "experiment.log"))
    logger.info("Start of experiment: %s",
                json.dumps(vars(args), sort_keys=True))

    bw = args.bits_w if args.bits_w is not None else args.bits
    ba = args.bits_a if args.bits_a is not None else args.bits
    bg = args.bits_g if args.bits_g is not None else args.bits
    if bw >= 32 and ba >= 32 and bg >= 32:
        import dataclasses
        cfg = dataclasses.replace(QuantConfig.fp32(), stem_s2d=args.stem_s2d)
    else:
        cfg = QuantConfig(
            bits_w=bw, bits_a=ba, bits_b=bw, bits_g=bg,
            conv_act_extra=0 if ba >= 32 else args.conv_act_extra,
            target_overflow_rate=args.target_overflow_rate,
            stochastic=not args.deterministic_rounding,
            noise_shared_axis0=args.noise_shared_axis0,
            noise_mode=args.noise_mode,
            engine=args.engine,
            fused_bn=args.fused_bn,
            bn_momentum=args.bn_momentum,
            faithful_eval=args.faithful_eval,
            range_update_every=args.range_update_every,
            act_dtype=args.act_dtype,
            remat_bn=args.remat_bn,
            bn_residual_q16=args.bn_residual_q16,
            initial_exponent_g=args.initial_exponent_g,
            stem_s2d=args.stem_s2d,
        )
    tc = TrainConfig(
        lr=args.lr, momentum=args.momentum,
        weight_decay=args.weight_decay, batch_size=args.batch_size,
        n_epoch=args.n_epoch, lr_decay_factor=args.lr_decay_factor,
        lr_decay_epochs=tuple(args.lr_decay_epochs),
        warmup_epochs=args.warmup_epochs,
        dropout_keep=args.dropout,
        reset_momentum_on_decay=args.reset_momentum_on_decay,
        seed=args.seed,
        log_every=args.log_every,
        checkpoint_every_epochs=args.checkpoint_every,
        checkpoint_dir=os.path.join(exp, "ckpt"),
        data_parallel=args.data_parallel or args.lowbit_allreduce,
        lowbit_allreduce=args.lowbit_allreduce,
        lowbit_wire=args.lowbit_wire,
        scan_steps=args.scan_steps,
    )

    model_kw = dict(dropout_keep=args.dropout,
                    weight_decay=args.weight_decay)
    if args.gradient_buffer:
        if "Resnet" not in args.model or "Imagenet" in args.model:
            raise SystemExit("--gradient_buffer only supported for the "
                             "CIFAR10_Resnet* models (reference sites)")
        model_kw["gradient_buffer_batch"] = args.batch_size
    model = build_model(args.model, cfg, **model_kw)
    ds_name = MODEL_DATASET[args.model]
    if args.tfrecord_train:
        from lbt_tpu.data.tfrecord import tfrecord_dataset
        if args.num_classes is None:
            raise SystemExit("--tfrecord_train requires --num_classes")
        data = tfrecord_dataset(
            args.tfrecord_train, args.tfrecord_val,
            image_size=model.input_shape[0], seed=args.seed,
            num_classes=args.num_classes)
        augment = None  # the native source augments on the host
        if args.native_loader:
            raise SystemExit("--native_loader needs in-memory arrays; "
                             "drop it when streaming TFRecords")
    elif args.data_dir:
        from lbt_tpu.data.imagefolder import streaming_dataset
        image_size = model.input_shape[0]
        val = os.path.join(args.data_dir, "val")
        data = streaming_dataset(
            os.path.join(args.data_dir, "train"),
            val if os.path.isdir(val) else None,
            image_size=image_size, seed=args.seed)
        augment = None  # the streaming source augments on the host
        if args.native_loader:
            raise SystemExit("--native_loader needs in-memory arrays; "
                             "drop it when using --data_dir streaming")
    else:
        data = load_dataset(ds_name, n_train=args.n_train,
                            n_test=args.n_test)
        if data["synthetic"]:
            logger.warning("dataset %s not found locally - SYNTHETIC data",
                           ds_name)
        augment = None if args.no_augment else make_augment(ds_name)

    # Trainer.train() auto-resumes from checkpoint_dir when one exists;
    # --resume is accepted for explicitness
    from lbt_tpu.data.datasets import aug_spec
    trainer = Trainer(model, tc, data, augment=augment, logger=logger,
                      logdir=exp, profile_steps=args.profile_steps,
                      native_loader=args.native_loader,
                      aug_spec=aug_spec(ds_name))
    final = trainer.train()
    logger.info("End of experiment: final test acc %.4f",
                final["accuracy"])


if __name__ == "__main__":
    main()
