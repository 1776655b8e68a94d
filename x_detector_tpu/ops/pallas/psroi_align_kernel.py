"""Pallas TPU kernel for PSROIAlign (SURVEY.md §2.5 O1/O2 equivalent).

Strategy (see ops/psroi_align.py for the math): position-sensitive
RoI-align pooling factorizes into separable triangular-kernel contractions

    out[r, i, j, c] = (1/S^2) * sum_p WY[r,i,p] * sum_q WX[r,j,q]
                                 * feat[p, q, (i*k+j), c]

The XLA einsum implementation materializes the intermediate
``A[r, i, q, j, c]`` (~= R*k*W*k*C floats per image) in HBM twice; this
kernel keeps everything on-chip:

  * the whole thin feature map (50x50x490 bf16 ~= 2.4 MB at 800px) sits in
    VMEM for all grid steps;
  * each grid step processes a block of BLOCK_R rois: interpolation weights
    are built in-kernel with ``broadcasted_iota`` (no gather), the row
    contraction is ONE MXU matmul ``[BLOCK_R*k, H] @ [H, W*k*k*C]``, and the
    column contraction runs per (i, j) bin on statically-sliced sub-blocks
    (the position-sensitive "diagonal" — bin (i, j) only reads channel group
    i*k+j — is exploited by the slicing, not wasted FLOPs);
  * output: [BLOCK_R, k, k, C] written per step.

Backward: expressed via ``jax.custom_vjp`` as the transposed contractions in
plain XLA (deterministic, atomic-free — the reference's CUDA backward used
``atomicAdd`` and was order-nondeterministic, SURVEY.md §5).  Gradients flow
to ``features`` only (rois are detached, standard for detection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x_detector_tpu.ops.psroi_align import (_interp_weights, _sample_coords,
                                            psroi_align)

BLOCK_R = 8


def _weights_in_kernel(lo, hi, grid: int, samples: int, extent: int):
    """[BLOCK_R] lo/hi -> [BLOCK_R * grid, extent] interpolation weights.

    Mirrors _sample_coords + _interp_weights with iota-built pixel/sample
    grids (TPU needs >= 2D iota).
    """
    br = lo.shape[0]
    span = (hi - lo) / grid                                   # [br]
    cell = jax.lax.broadcasted_iota(jnp.float32, (br, grid, samples), 1)
    sub = (jax.lax.broadcasted_iota(jnp.float32, (br, grid, samples), 2)
           + 0.5) / samples
    norm = lo[:, None, None] + (cell + sub) * span[:, None, None]
    px = jnp.clip(norm * extent - 0.5, 0.0, extent - 1.0)     # [br, g, S]
    pix = jax.lax.broadcasted_iota(jnp.float32,
                                   (br, grid, samples, extent), 3)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(pix - px[..., None]))
    return wgt.sum(axis=2).reshape(br * grid, extent)         # [br*g, E]


def _psroi_kernel(rois_ref, feat_ref, out_ref, *, grid: int, samples: int,
                  channels: int, height: int, width: int):
    rois = rois_ref[:]                                        # [BLOCK_R, 4]
    wy = _weights_in_kernel(rois[:, 0], rois[:, 2], grid, samples, height)
    wx = _weights_in_kernel(rois[:, 1], rois[:, 3], grid, samples, width)

    feat2d = feat_ref[:].reshape(height, width * grid * grid * channels)
    # Row contraction on the MXU: [BLOCK_R*grid, H] @ [H, W*k*k*C]
    a = jax.lax.dot(wy.astype(feat2d.dtype), feat2d,
                    preferred_element_type=jnp.float32)
    a = a.reshape(BLOCK_R, grid, width, grid * grid, channels)

    inv = 1.0 / float(samples * samples)
    for i in range(grid):
        for j in range(grid):
            # position-sensitive diagonal: bin (i, j) reads group i*grid+j
            a_bin = a[:, i, :, i * grid + j, :]               # [br, W, C]
            wx_bin = wx.reshape(BLOCK_R, grid, width)[:, j, :]  # [br, W]
            pooled = jnp.sum(a_bin * wx_bin[:, :, None], axis=1) * inv
            out_ref[:, i, j, :] = pooled.astype(out_ref.dtype)


def _psroi_pallas_raw(features: jnp.ndarray, rois: jnp.ndarray,
                      grid: int, samples: int) -> jnp.ndarray:
    h, w, kkc = features.shape
    c = kkc // (grid * grid)
    r = rois.shape[0]
    assert r % BLOCK_R == 0, f"roi count {r} must be a multiple of {BLOCK_R}"
    feat = features.reshape(h, w, grid * grid, c)

    kernel = functools.partial(_psroi_kernel, grid=grid, samples=samples,
                               channels=c, height=h, width=w)
    return pl.pallas_call(
        kernel,
        grid=(r // BLOCK_R,),
        in_specs=[
            pl.BlockSpec((BLOCK_R, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w, grid * grid, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_R, grid, grid, c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, grid, grid, c), jnp.float32),
    )(rois.astype(jnp.float32), feat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def psroi_align_pallas(features: jnp.ndarray, rois: jnp.ndarray,
                       grid: int = 7, samples: int = 2) -> jnp.ndarray:
    """Pallas PSROIAlign: [H, W, k*k*C] x [R, 4] -> [R, k, k, C] (fp32)."""
    return _psroi_pallas_raw(features, rois, grid, samples)


def _fwd(features, rois, grid, samples):
    return _psroi_pallas_raw(features, rois, grid, samples), (features, rois)


def _bwd(grid, samples, res, g):
    features, rois = res
    h, w, kkc = features.shape
    c = kkc // (grid * grid)
    ys = _sample_coords(rois.astype(jnp.float32), grid, samples, h, 0, 2)
    xs = _sample_coords(rois.astype(jnp.float32), grid, samples, w, 1, 3)
    wy = _interp_weights(ys, h)                               # [R, k, H]
    wx = _interp_weights(xs, w)                               # [R, k, W]
    scale = 1.0 / float(samples * samples)
    # d feat[p,q,(i,j),c] = sum_r wy[r,i,p] * wx[r,j,q] * g[r,i,j,c]
    # (each channel group (i, j) receives only from its own bin)
    gw2 = jnp.einsum("rijc,rjq->rijqc", g.astype(jnp.float32), wx)
    dfeat_full = jnp.einsum("rip,rijqc->pqijc", wy, gw2) * scale
    dfeat_full = dfeat_full.reshape(h, w, kkc).astype(features.dtype)
    return dfeat_full, jnp.zeros_like(rois)


psroi_align_pallas.defvjp(_fwd, _bwd)


def batched_psroi_align_pallas(features: jnp.ndarray, rois: jnp.ndarray,
                               grid: int = 7,
                               samples: int = 2) -> jnp.ndarray:
    """vmap over batch: [B, H, W, k*k*C] x [B, R, 4] -> [B, R, k, k, C]."""
    fn = functools.partial(psroi_align_pallas, grid=grid, samples=samples)
    return jax.vmap(fn)(features, rois)
