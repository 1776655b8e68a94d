"""Synthetic detection data: colored rectangles on noise backgrounds.

Stands in for Pascal VOC in this zero-egress environment (SURVEY.md §7:
"no network => use synthetic data + offline converters; design the data layer
so real VOC drops in").  Each class is a distinct fill color so the task is
learnable; boxes/labels use the exact batch schema of the real pipeline:

  image [S, S, 3] float32 raw RGB in [0, 255] (pre-whitening)
  gt_boxes [G, 4] normalized corners, zero-padded
  gt_labels [G] int32, gt_mask [G] bool
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

# 20 visually-distinct class colors (r, g, b)
_CLASS_COLORS = np.array([
    [220, 20, 60], [0, 128, 0], [0, 0, 205], [255, 215, 0], [255, 105, 180],
    [0, 206, 209], [255, 140, 0], [128, 0, 128], [154, 205, 50], [70, 130, 180],
    [210, 105, 30], [0, 255, 127], [219, 112, 147], [100, 149, 237],
    [189, 183, 107], [205, 92, 92], [60, 179, 113], [186, 85, 211],
    [244, 164, 96], [176, 196, 222]], np.float32)


def synthetic_example(rng: np.random.Generator, image_size: int,
                      max_gt: int, max_objects: int = 6,
                      num_classes: int = 20) -> Dict[str, np.ndarray]:
    img = rng.uniform(0, 60, (image_size, image_size, 3)).astype(np.float32)
    n = int(rng.integers(1, max_objects + 1))
    boxes = np.zeros((max_gt, 4), np.float32)
    labels = np.zeros((max_gt,), np.int32)
    mask = np.zeros((max_gt,), bool)
    for i in range(min(n, max_gt)):
        cls = int(rng.integers(0, num_classes))
        h = rng.uniform(0.15, 0.5)
        w = rng.uniform(0.15, 0.5)
        cy = rng.uniform(h / 2, 1 - h / 2)
        cx = rng.uniform(w / 2, 1 - w / 2)
        y0, x0 = cy - h / 2, cx - w / 2
        y1, x1 = cy + h / 2, cx + w / 2
        py0, px0 = int(y0 * image_size), int(x0 * image_size)
        py1, px1 = max(int(y1 * image_size), py0 + 2), max(
            int(x1 * image_size), px0 + 2)
        img[py0:py1, px0:px1] = _CLASS_COLORS[cls] + rng.normal(
            0, 8, (py1 - py0, px1 - px0, 3)).astype(np.float32)
        boxes[i] = [y0, x0, y1, x1]
        labels[i] = cls + 1  # 0 is background
        mask[i] = True
    np.clip(img, 0, 255, out=img)
    return {"image": img, "gt_boxes": boxes, "gt_labels": labels,
            "gt_mask": mask}


def synthetic_batches(seed: int, batch_size: int, image_size: int,
                      max_gt: int = 100,
                      num_classes: int = 20) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite iterator of stacked batches."""
    rng = np.random.default_rng(seed)
    while True:
        exs = [synthetic_example(rng, image_size, max_gt,
                                 num_classes=num_classes)
               for _ in range(batch_size)]
        yield {k: np.stack([e[k] for e in exs]) for k in exs[0]}


# ---------------------------------------------------------------------------
# Device-side generator (jit-able): infinite fresh data with zero host
# involvement — used for on-hardware training demos and benchmarking where
# the host->device tunnel would otherwise bound throughput.
# ---------------------------------------------------------------------------

def synthetic_batch_device(key, batch_size: int, image_size: int,
                           max_gt: int = 100, num_classes: int = 20,
                           max_objects: int = 6):
    """jit-able synthetic detection batch on the accelerator.

    Same task family as :func:`synthetic_example` (class-colored rectangles
    on dim noise), entirely in jax.  Returns the trainer batch schema with
    raw [0, 255] RGB images.
    """
    import jax
    import jax.numpy as jnp

    palette = jnp.asarray(_CLASS_COLORS[:num_classes])

    def one(key):
        kn, kc, kh, kw, ky, kx, kl, kg = jax.random.split(key, 8)
        img = jax.random.uniform(kn, (image_size, image_size, 3),
                                 minval=0.0, maxval=60.0)
        n = jax.random.randint(kc, (), 1, max_objects + 1)
        g = jnp.arange(max_gt)
        mask = g < jnp.minimum(n, max_gt)
        h = jax.random.uniform(kh, (max_gt,), minval=0.15, maxval=0.5)
        w = jax.random.uniform(kw, (max_gt,), minval=0.15, maxval=0.5)
        cy = jax.random.uniform(ky, (max_gt,)) * (1 - h) + h / 2
        cx = jax.random.uniform(kx, (max_gt,)) * (1 - w) + w / 2
        boxes = jnp.stack([cy - h / 2, cx - w / 2,
                           cy + h / 2, cx + w / 2], axis=-1)
        labels = jax.random.randint(kl, (max_gt,), 1, num_classes + 1)
        boxes = jnp.where(mask[:, None], boxes, 0.0)
        labels = jnp.where(mask, labels, 0).astype(jnp.int32)

        yy = (jnp.arange(image_size, dtype=jnp.float32)[:, None]
              + 0.5) / image_size
        xx = (jnp.arange(image_size, dtype=jnp.float32)[None, :]
              + 0.5) / image_size
        noise = jax.random.normal(kg, (image_size, image_size, 3)) * 8.0

        def paint(i, im):
            inb = ((yy >= boxes[i, 0]) & (yy < boxes[i, 2]) &
                   (xx >= boxes[i, 1]) & (xx < boxes[i, 3]) & mask[i])
            color = palette[labels[i] - 1]
            return jnp.where(inb[:, :, None], color + noise, im)

        img = jax.lax.fori_loop(0, max_objects, paint, img)
        img = jnp.clip(img, 0.0, 255.0)
        return {"image": img, "gt_boxes": boxes, "gt_labels": labels,
                "gt_mask": mask}

    keys = jax.random.split(key, batch_size)
    return jax.vmap(one)(keys)
