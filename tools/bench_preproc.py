"""Preprocessing throughput benchmark (BASELINE metric: preproc imgs/sec/host).

Measures the two halves of the input pipeline separately:
  1. host side — the native C++ loader (TFRecord read + JPEG decode + canvas
     resize) over generated VOC-style records;
  2. device side — the fused jit augmentation stage
     (crop sample -> crop+resize -> color jitter -> flip -> whiten).

Usage:  python tools/bench_preproc.py [--batch 64] [--canvas 640]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--canvas", type=int, default=640)
    p.add_argument("--out-size", type=int, default=512)
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--threads", type=int, default=8)
    args = p.parse_args()

    import numpy as np

    # --- host side: native loader over generated records
    from test_voc_io import make_fake_voc
    from x_detector_tpu.data import tfrecord as tfr
    from x_detector_tpu.data.native_loader import NativeLoader

    tmp = tempfile.mkdtemp()
    print(f"generating {args.images} fake VOC images...", file=sys.stderr)
    make_fake_voc(tmp, n_images=args.images)
    paths = tfr.convert_voc_to_tfrecords(
        tmp, [("2007", "trainval")], tmp + "/rec", shard_size=16)

    loader = NativeLoader(paths, canvas_size=args.canvas, max_gt=100,
                          batch_size=args.batch, shuffle=True, repeat=True,
                          num_threads=args.threads)
    next(loader)  # warm
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.iters):
        b = next(loader)
        n += b["image"].shape[0]
    host_rate = n / (time.perf_counter() - t0)
    loader.close()
    print(f"host loader (decode+resize {args.canvas}px, "
          f"{args.threads} threads): {host_rate:.1f} imgs/sec/host")

    # --- device side: fused augmentation
    import jax
    import jax.numpy as jnp

    from x_detector_tpu.config import DataConfig
    from x_detector_tpu.data.augment import preprocess_batch_for_train

    cfg = DataConfig(image_size=args.out_size, max_gt_boxes=100)
    rng = np.random.default_rng(0)
    batches = []
    for i in range(3):
        batches.append({
            "image": jnp.asarray(rng.uniform(
                0, 255, (args.batch, args.canvas, args.canvas, 3)).astype(
                np.float32)),
            "gt_boxes": jnp.asarray(np.tile(np.asarray(
                [[[0.2, 0.2, 0.7, 0.7]] + [[0.0] * 4] * 99], np.float32),
                (args.batch, 1, 1))),
            "gt_labels": jnp.asarray(np.tile(np.asarray(
                [[1] + [0] * 99], np.int32), (args.batch, 1))),
            "gt_mask": jnp.asarray(np.tile(np.asarray(
                [[True] + [False] * 99]), (args.batch, 1))),
        })

    fn = jax.jit(lambda key, b: jax.tree_util.tree_map(
        lambda x: x.sum(), preprocess_batch_for_train(key, b, cfg)))
    _ = np.asarray(fn(jax.random.PRNGKey(0), batches[0])["image"])
    t0 = time.perf_counter()
    out = None
    for i in range(args.iters):
        out = fn(jax.random.PRNGKey(i), batches[i % len(batches)])
    _ = np.asarray(out["image"])
    dev_rate = args.batch * args.iters / (time.perf_counter() - t0)
    print(f"device fused augmentation ({args.canvas}->{args.out_size}px): "
          f"{dev_rate:.1f} imgs/sec")


if __name__ == "__main__":
    main()
