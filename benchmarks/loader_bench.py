"""Native input-pipeline throughput vs the device's consumption rate.

The headline train rate (bench.py: ~1,930 img/s of 224^2 ResNet-50
DFP-INT8) implies the input pipeline must sustain ~1,930 JPEG
decode+RandomResizedCrop+normalize per second (~200-300 MB/s of
compressed bytes at ImageNet sizes) or the chip starves.  This measures
the C++ TFRecord pipeline (native/tfrecord.cc: mmap shards, CRC32C,
tf.Example walk, libjpeg-turbo decode, crop/flip/normalize on OpenMP
worker threads) in isolation — img/s vs worker count — and reports each
rate as a fraction of the device demand.

Synthetic shards: a pool of distinct ~IMAGENET-sized JPEGs is generated
once with PIL and cycled into N records (decode cost per record is what
matters; the bytes differ per record via the pool).

Usage: python benchmarks/loader_bench.py [--records 4096]
       [--workers 1 2 4 8 0] [--json out.json]
"""

import argparse
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lbt_tpu.data import tfrecord as tfr

DEVICE_DEMAND_IMG_S = 1930.0  # bench.py headline, round 3


def make_shards(tmp, records: int, shards: int = 8, side: int = 400,
                pool: int = 64, quality: int = 90):
    from PIL import Image
    rng = np.random.default_rng(0)
    jpegs = []
    for _ in range(pool):
        # low-frequency content so files hit realistic ImageNet sizes
        base = rng.integers(0, 255, (side // 8, side // 8, 3), np.uint8)
        img = Image.fromarray(base).resize((side, side), Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=quality)
        jpegs.append(buf.getvalue())
    avg_kb = sum(len(j) for j in jpegs) / len(jpegs) / 1024
    paths = []
    per = records // shards
    for s in range(shards):
        p = os.path.join(tmp, f"train-{s:05d}.tfrecord")
        with tfr.TFRecordWriter(p) as w:
            for i in range(per):
                j = jpegs[(s * per + i) % pool]
                w.write(tfr.make_example(j, (s * per + i) % 1000))
        paths.append(p)
    return paths, avg_kb


def measure(paths, workers: int, batch: int = 128, image: int = 224,
            epochs: int = 2):
    ds = tfr.TFRecordDataset(paths, image_size=image, train=True,
                             workers=workers)
    n = 0
    # epoch 0 warms (thread spawn, page cache); epoch 1+ timed
    for _ in ds.batches(0, batch):
        pass
    t0 = time.perf_counter()
    for e in range(1, epochs + 1):
        for x, y in ds.batches(e, batch):
            n += len(y)
    dt = time.perf_counter() - t0
    ds.close()
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=4096)
    ap.add_argument("--workers", type=int, nargs="*",
                    default=[1, 2, 4, 8, 0])
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        paths, avg_kb = make_shards(tmp, args.records)
        print(f"{args.records} records, avg jpeg {avg_kb:.0f} KiB",
              flush=True)
        out = {"records": args.records, "avg_jpeg_kib": round(avg_kb, 1),
               "device_demand_img_s": DEVICE_DEMAND_IMG_S, "rates": {}}
        for w in args.workers:
            rate = measure(paths, w, image=args.image)
            frac = rate / DEVICE_DEMAND_IMG_S
            mb = rate * avg_kb / 1024
            name = str(w) if w else "auto"
            out["rates"][name] = {"img_per_s": round(rate, 1),
                                  "mb_per_s": round(mb, 1),
                                  "x_device_demand": round(frac, 2)}
            print(f"workers={name:4s} {rate:8.0f} img/s  {mb:6.0f} MB/s "
                  f" = {frac:4.2f}x device demand", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
