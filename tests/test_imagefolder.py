"""Streaming ImageFolder pipeline (lbt_tpu/data/imagefolder.py): the
reference's orphaned torchvision/ImageNet scope (reference data.py:58-93)
as a shipped, tested capability."""

import numpy as np
import pytest

from lbt_tpu.data.imagefolder import ImageFolderDataset, streaming_dataset

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for ci, cname in enumerate(["ants", "bees"]):
            d = root / split / cname
            d.mkdir(parents=True)
            n = 6 if split == "train" else 3
            for i in range(n):
                arr = rng.integers(0, 255, (50, 40, 3), np.uint8)
                # constant channel bias per class so labels are learnable
                arr[..., ci] //= 2
                Image.fromarray(arr).save(d / f"im{i}.jpeg")
    return root


def test_scan_and_batches(tree):
    ds = ImageFolderDataset(str(tree / "train"), image_size=32, train=True,
                            seed=3)
    assert len(ds) == 12 and ds.classes == ["ants", "bees"]
    batches = list(ds.batches(epoch=0, batch_size=4))
    assert len(batches) == 3  # 12 / 4, drop_remainder
    for x, y in batches:
        assert x.shape == (4, 32, 32, 3) and x.dtype == np.float32
        assert y.shape == (4,) and y.dtype == np.int32
        assert -1.0 <= x.min() and x.max() <= 1.0
    ys = np.concatenate([y for _, y in batches])
    assert set(ys.tolist()) == {0, 1}


def test_train_stream_deterministic_per_epoch(tree):
    ds = ImageFolderDataset(str(tree / "train"), image_size=24, train=True,
                            seed=7)
    a = list(ds.batches(0, 4))
    b = list(ds.batches(0, 4))
    for (xa, ya), (xb, yb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
    c = list(ds.batches(1, 4))
    assert any(not np.array_equal(ya, yc)
               or not np.array_equal(xa, xc)
               for (xa, ya), (xc, yc) in zip(a, c))


def test_eval_stream_keeps_remainder_and_is_deterministic(tree):
    ds = ImageFolderDataset(str(tree / "val"), image_size=32, train=False)
    batches = list(ds.batches(0, 4))
    assert sum(len(y) for _, y in batches) == 6  # nothing dropped
    again = list(ds.batches(0, 4))
    for (xa, _), (xb, _) in zip(batches, again):
        np.testing.assert_array_equal(xa, xb)


@pytest.mark.slow
def test_trainer_end_to_end_streaming(tree, tmp_path):
    import jax

    from lbt_tpu.config import QuantConfig, TrainConfig
    from lbt_tpu.nn import Conv2d, Dense, Flatten, ReLU
    from lbt_tpu.nn.model import Model
    from lbt_tpu.train.trainer import Trainer

    data = streaming_dataset(str(tree / "train"), str(tree / "val"),
                             image_size=16, seed=1, workers=2)
    assert data["num_classes"] == 2 and data["n_train"] == 12

    cfg = QuantConfig.uniform(8, engine="int8", noise_mode="hash")
    model = Model("tiny", [
        Conv2d("c1", cfg, (3, 3, 3, 8), (2, 2), padding="SAME"),
        ReLU(),
        Flatten("f"),
        Dense("d", cfg, 8 * 8 * 8, 2),
    ], input_shape=(16, 16, 3), num_classes=2, cfg=cfg)
    tc = TrainConfig(lr=0.01, batch_size=4, n_epoch=2, eval_batch_size=4,
                     log_every=1)
    tr = Trainer(model, tc, data)
    tr.train_epoch(0)
    ev = tr.evaluate()
    assert np.isfinite(ev["loss"]) and 0.0 <= ev["accuracy"] <= 1.0
