"""Dataset inspection CLI (SURVEY.md §2.1 D3): decode a few examples from a
TFRecord directory (or synthetic data), draw their ground-truth boxes, and
write annotated PNGs — the sanity check that conversion/reading is correct.

Example:
  python -m x_detector_tpu.cli.inspect_data --data-dir /data/records \
      --num-images 4 --output-dir /tmp/inspect
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from x_detector_tpu.cli import common
from x_detector_tpu.utils.draw import draw_detections


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--num-images", type=int, default=4)
    p.add_argument("--output-dir", default="/tmp/xdet_inspect")
    p.add_argument("--canvas", type=int, default=512)
    args = p.parse_args(argv)

    cfg = common.resolve_config(args)
    it = common.batch_iterator(args, cfg, training=False,
                               canvas_size=args.canvas)
    os.makedirs(args.output_dir, exist_ok=True)

    from PIL import Image
    written = 0
    while written < args.num_images:
        batch = next(it)
        bsz = batch["image"].shape[0]
        for i in range(bsz):
            if written >= args.num_images:
                break
            mask = np.asarray(batch["gt_mask"][i])
            boxes = np.asarray(batch["gt_boxes"][i])[mask]
            labels = np.asarray(batch["gt_labels"][i])[mask]
            vis = draw_detections(
                np.asarray(batch["image"][i]), boxes,
                np.ones(len(boxes)), labels,
                score_threshold=-1.0)
            if "image_id" in batch:
                image_id = batch["image_id"][i]
                name = (image_id.decode() if isinstance(image_id, bytes)
                        else str(image_id))
            else:
                name = f"synthetic_{written}"
            out = os.path.join(args.output_dir, f"{name}.png")
            Image.fromarray(vis).save(out)
            print(f"{out}: {len(boxes)} gt boxes, "
                  f"classes {sorted(set(labels.tolist()))}")
            written += 1
    print(f"wrote {written} annotated images to {args.output_dir}")


if __name__ == "__main__":
    main()
