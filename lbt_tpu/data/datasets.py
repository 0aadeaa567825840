"""Datasets + preprocessing.

Mirrors the reference recipe (reference main.py:47-80): per-pixel
*train-set* mean subtraction then division by 128 (values roughly in
[-1, 1], matching the quantizers' initial exponent of 2), and the
reference's CIFAR augmentation (random horizontal flip, pad 4, random
32x32 crop; reference trainer.py:24-28) — implemented on-device in JAX
rather than in a host tf.data pipeline.

Sources, in order: a local cache (``LBT_DATA_DIR`` or ~/.keras/datasets
npz files in the keras layout), else a deterministic *synthetic* stand-in
(class-prototype images + noise, so models actually learn) — this
environment has no network egress.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Arrays = Tuple[np.ndarray, np.ndarray]

_SHAPES = {
    "mnist": ((28, 28, 1), 10, 60000, 10000),
    "pi_mnist": ((784,), 10, 60000, 10000),
    "cifar10": ((32, 32, 3), 10, 50000, 10000),
    "cifar100": ((32, 32, 3), 100, 50000, 10000),
    "imagenet": ((224, 224, 3), 1000, 128116, 5000),  # imagenet-subset scale
    # ImageNet-stem-shaped accuracy harness: same 7x7/s2 stem + stage
    # topology as 'imagenet' but 112px, so multi-arm certification runs
    # (e.g. the s2d stem) fit host memory / tunnel bandwidth (round 5)
    "imagenet112": ((112, 112, 3), 1000, 32768, 5000),
}

_KERAS_FILES = {
    "mnist": "mnist.npz",
    "pi_mnist": "mnist.npz",
}


def _data_dirs():
    dirs = []
    if os.environ.get("LBT_DATA_DIR"):
        dirs.append(os.environ["LBT_DATA_DIR"])
    dirs.append(os.path.expanduser("~/.keras/datasets"))
    return dirs


def _load_raw(name: str):
    """Raw uint8 (X_train, y_train), (X_test, y_test) or None."""
    for d in _data_dirs():
        # keras mnist layout
        f = os.path.join(d, _KERAS_FILES.get(name, f"{name}.npz"))
        if os.path.exists(f):
            z = np.load(f)
            if {"x_train", "y_train", "x_test", "y_test"} <= set(z.files):
                return ((z["x_train"], z["y_train"]),
                        (z["x_test"], z["y_test"]))
    return None


def _synthetic(name: str, n_train: int, n_test: int, seed: int = 1234,
               signal: float = 1.0, n_classes: int = 0,
               label_noise: float = 0.0):
    """Learnable synthetic stand-in: each class has a smooth prototype
    image; samples are prototype + noise, quantized to uint8.

    ``signal`` scales the prototype relative to the fixed unit sample
    noise — the default 1.0 gives a high-SNR task every config memorizes
    to ~100% (fine as a training smoke test, useless as a gap
    instrument).  The *hard* generalization harness
    (benchmarks/accuracy.py --hard) lowers ``signal`` and raises
    ``n_classes`` so that the Bayes-suboptimal estimation error of a
    small training set dominates: test accuracy then sits mid-range for
    FP32 and degrades measurably as quantization noise competes with the
    class signal.  ``label_noise`` flips that fraction of TRAIN labels
    uniformly (test labels stay clean)."""
    shape, def_classes, _, _ = _SHAPES[name]
    n_classes = n_classes or def_classes
    rng = np.random.default_rng(seed)
    protos = rng.normal(0.0, 1.0, (n_classes,) + shape).astype(np.float32)
    # smooth the prototypes a little so conv nets have structure to find
    if len(shape) == 3 and shape[0] >= 8:
        k = np.ones((5, 5, 1), np.float32) / 25.0
        from scipy.ndimage import convolve  # available in the image
        protos = np.stack([convolve(p, k, mode="wrap") for p in protos])
        protos /= protos.std() + 1e-8
    protos *= signal

    def draw(n, seed2, flip_frac=0.0):
        r = np.random.default_rng(seed2)
        y = r.integers(0, n_classes, n).astype(np.int32)
        x = protos[y] + r.normal(0.0, 1.5, (n,) + shape).astype(np.float32)
        x = np.clip((x * 32) + 128, 0, 255).astype(np.uint8)
        if flip_frac > 0.0:
            m = r.random(n) < flip_frac
            y = np.where(m, r.integers(0, n_classes, n).astype(np.int32), y)
        return x, y

    return (draw(n_train, seed + 1, label_noise),
            draw(n_test, seed + 2)), n_classes


@functools.lru_cache(maxsize=None)
def load_dataset(name: str, n_train: int = 0, n_test: int = 0,
                 flatten: bool = False, signal: float = 1.0,
                 override_classes: int = 0,
                 label_noise: float = 0.0) -> Dict[str, Arrays]:
    """Returns {'train': (X, y), 'test': (X, y), 'synthetic': bool} with
    float32 X preprocessed the reference way (mean-sub, /128).

    ``signal`` / ``override_classes`` / ``label_noise`` shape the
    synthetic fallback only (gap-sensitive accuracy harness — see
    _synthetic); they are ignored when real cached data is found."""
    if name not in _SHAPES:
        raise ValueError(f"unknown dataset {name!r}")
    shape, n_classes, def_train, def_test = _SHAPES[name]
    n_train = n_train or def_train
    n_test = n_test or def_test

    raw = _load_raw(name)
    synthetic = raw is None
    if synthetic:
        raw, n_classes = _synthetic(
            name, n_train, n_test, signal=signal, n_classes=override_classes,
            label_noise=label_noise)
    (xtr, ytr), (xte, yte) = raw
    xtr, ytr = xtr[:n_train], ytr[:n_train]
    xte, yte = xte[:n_test], yte[:n_test]

    xtr = xtr.astype(np.float32)
    xte = xte.astype(np.float32)
    if xtr.ndim == 3:  # mnist HxW -> HxWx1
        xtr, xte = xtr[..., None], xte[..., None]
    mean = xtr.mean(axis=0)
    xtr = (xtr - mean) / 128.0
    xte = (xte - mean) / 128.0
    ytr = ytr.astype(np.int32).reshape(-1)
    yte = yte.astype(np.int32).reshape(-1)

    if name == "pi_mnist" or flatten:
        xtr = xtr.reshape(len(xtr), -1)
        xte = xte.reshape(len(xte), -1)

    return {"train": (xtr, ytr), "test": (xte, yte),
            "synthetic": synthetic, "num_classes": n_classes}


# ---------------------------------------------------------------------------
# on-device augmentation (reference trainer.py:24-28)
# ---------------------------------------------------------------------------


def _augment_crop_flip(key: jax.Array, x: jax.Array, pad: int) -> jax.Array:
    """Random horizontal flip + pad-and-random-crop, batched on device."""
    n, h, w, c = x.shape
    kf, kh, kw = jax.random.split(key, 3)
    flip = jax.random.bernoulli(kf, 0.5, (n,))
    x = jnp.where(flip[:, None, None, None], jnp.flip(x, axis=2), x)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = jax.random.randint(kh, (n,), 0, 2 * pad + 1)
    ow = jax.random.randint(kw, (n,), 0, 2 * pad + 1)

    def crop(img, i, j):
        return jax.lax.dynamic_slice(img, (i, j, 0), (h, w, c))

    return jax.vmap(crop)(xp, oh, ow)


# flip + pad-crop parameters per dataset (reference trainer.py:24-28 uses
# pad 4 for CIFAR); None = no augmentation
AUG_SPECS = {
    "cifar10": {"pad": 4, "flip": True},
    "cifar100": {"pad": 4, "flip": True},
    "imagenet": {"pad": 16, "flip": True},
    "imagenet112": {"pad": 8, "flip": True},
}


def aug_spec(dataset: str):
    return AUG_SPECS.get(dataset)


def make_augment(dataset: str):
    """On-device augmentation fn (key, x) -> x for a dataset, or None."""
    spec = AUG_SPECS.get(dataset)
    if spec is None:
        return None
    return functools.partial(_augment_crop_flip, pad=spec["pad"])
