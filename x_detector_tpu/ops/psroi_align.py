"""PSROIAlign: position-sensitive RoI-align pooling, TPU-native.

Replaces the reference's only native op (SURVEY.md §2.5 O1/O2: a C++/CUDA
TensorFlow custom op ``PsRoiAlign`` with an ``atomicAdd`` backward).  Two
implementations, bit-compared in tests:

* :func:`psroi_align_reference` — direct gather formulation (vmap over rois,
  explicit 4-tap bilinear). The correctness oracle.
* :func:`psroi_align` — **separable-interpolation einsum** formulation.
  Bilinear weights factor into row and column triangular kernels, so pooling
  becomes two dense contractions that XLA lowers onto the MXU:

      out[r,i,j,c] = (1/S^2) * sum_p WY[r,i,p] * sum_q WX[r,j,q]
                                  * feat[p,q,(i,j),c]

  with WY/WX built from ``relu(1 - |pixel - sample|)`` — no scatter in the
  forward, and the autodiff backward is just the transposed contractions:
  deterministic by construction (the reference's CUDA backward was
  order-nondeterministic via atomicAdd; SURVEY.md §5 commits us to deleting
  that nondeterminism).

Semantics (matching SURVEY.md §3.5):
  * ``features``: [H, W, k*k*C] — channel group g = i*k + j serves bin (i,j).
  * ``rois``: [R, 4] normalized corners [ymin, xmin, ymax, xmax].
  * Each of the k x k bins is sampled at ``samples`` x ``samples`` uniform
    points with RoIAlign continuous (no-quantization) coordinates, bilinearly
    interpolated and mean-pooled.
  * Sample coordinates are clamped to the feature extent (TF
    ``crop_and_resize`` convention), so edge rois extrapolate to edge pixels.
  * Output: [R, k, k, C].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sample_coords(rois: jnp.ndarray, grid: int, samples: int,
                   extent: int, axis0: int, axis1: int) -> jnp.ndarray:
    """Continuous pixel coords of every sample along one axis.

    rois[:, axis0]/rois[:, axis1] are the normalized lo/hi of that axis.
    Returns [R, grid, samples] clamped to [0, extent - 1].
    """
    lo = rois[:, axis0][:, None, None]
    hi = rois[:, axis1][:, None, None]
    span = (hi - lo) / grid
    cell = jnp.arange(grid, dtype=rois.dtype)[None, :, None]
    sub = (jnp.arange(samples, dtype=rois.dtype)[None, None, :] + 0.5) / samples
    norm = lo + (cell + sub) * span              # normalized in [0, 1]
    px = norm * extent - 0.5                     # continuous pixel coords
    return jnp.clip(px, 0.0, extent - 1.0)


def psroi_align_reference(features: jnp.ndarray, rois: jnp.ndarray,
                          grid: int = 7, samples: int = 2) -> jnp.ndarray:
    """Gather-based oracle. features [H, W, k*k*C] -> [R, k, k, C]."""
    h, w, kkc = features.shape
    c = kkc // (grid * grid)
    feat = features.reshape(h, w, grid, grid, c)

    ys = _sample_coords(rois, grid, samples, h, 0, 2)   # [R, k, S]
    xs = _sample_coords(rois, grid, samples, w, 1, 3)

    def one_roi(y, x):
        # y, x: [k, S] -> pooled [k, k, C]
        y0 = jnp.clip(jnp.floor(y), 0, h - 1)
        x0 = jnp.clip(jnp.floor(x), 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        fy = y - y0
        fx = x - x0
        y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
        x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)

        def tap(yi, xi):
            # yi [k, S] row indices; xi [k, S] col indices
            # gather feat[yi[i,m], xi[j,n], i, j, :] -> [k, S, k, S, C]
            g = feat[yi[:, :, None, None], xi[None, None, :, :],
                     jnp.arange(grid)[:, None, None, None],
                     jnp.arange(grid)[None, None, :, None]]
            return g

        w00 = ((1 - fy)[:, :, None, None] * (1 - fx)[None, None, :, :])
        w01 = ((1 - fy)[:, :, None, None] * fx[None, None, :, :])
        w10 = (fy[:, :, None, None] * (1 - fx)[None, None, :, :])
        w11 = (fy[:, :, None, None] * fx[None, None, :, :])
        acc = (w00[..., None] * tap(y0i, x0i) + w01[..., None] * tap(y0i, x1i)
               + w10[..., None] * tap(y1i, x0i) + w11[..., None] * tap(y1i, x1i))
        # mean over the S x S sample points: axes (1, 3)
        return acc.mean(axis=(1, 3))             # [k, k, C]

    return jax.vmap(one_roi)(ys, xs)


def _interp_weights(coords: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Dense triangular interpolation weights.

    coords: [R, k, S] continuous pixel positions ->
    weights [R, k, extent] where weight[p] = sum_s relu(1 - |p - coord_s|).
    """
    pix = jnp.arange(extent, dtype=coords.dtype)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(pix - coords[..., None]))
    return wgt.sum(axis=2)                        # collapse samples: [R, k, E]


@functools.partial(jax.jit, static_argnames=("grid", "samples", "precise"))
def psroi_align(features: jnp.ndarray, rois: jnp.ndarray,
                grid: int = 7, samples: int = 2,
                precise: bool = False) -> jnp.ndarray:
    """Separable-einsum PSROIAlign. features [H, W, k*k*C] -> [R, k, k, C].

    MXU-friendly: two einsum contractions, ~R*k^2*H*W*C*2 FLOPs; backward is
    the transposed einsums (deterministic, no atomics).  By default the
    contractions run in bf16 with fp32 accumulation (full MXU rate — the
    interpolation weights are exactly representable to ~3 decimal digits and
    the result feeds a bf16 head anyway); ``precise=True`` keeps fp32
    operands for oracle comparison.
    """
    h, w, kkc = features.shape
    c = kkc // (grid * grid)
    op_dtype = jnp.float32 if precise else jnp.bfloat16
    feat = features.reshape(h, w, grid, grid, c).astype(op_dtype)

    ys = _sample_coords(rois.astype(jnp.float32), grid, samples, h, 0, 2)
    xs = _sample_coords(rois.astype(jnp.float32), grid, samples, w, 1, 3)
    wy = _interp_weights(ys, h).astype(op_dtype)  # [R, k, H]
    wx = _interp_weights(xs, w).astype(op_dtype)  # [R, k, W]

    # Contract rows then columns; channel group (i, j) rides along.
    a = jnp.einsum("rip,pqijc->riqjc", wy, feat,
                   preferred_element_type=jnp.float32)  # [R, k, W, k, C]
    out = jnp.einsum("rjq,riqjc->rijc", wx, a.astype(op_dtype),
                     preferred_element_type=jnp.float32)
    return out / float(samples * samples)


def batched_psroi_align(features: jnp.ndarray, rois: jnp.ndarray,
                        grid: int = 7, samples: int = 2,
                        precise: bool = False) -> jnp.ndarray:
    """vmap over a batch: [B, H, W, k*k*C] x [B, R, 4] -> [B, R, k, k, C]."""
    fn = functools.partial(psroi_align, grid=grid, samples=samples,
                           precise=precise)
    return jax.vmap(fn)(features, rois)
