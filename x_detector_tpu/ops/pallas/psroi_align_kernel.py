"""Pallas TPU kernel for PSROIAlign (SURVEY.md §2.5 O1/O2 equivalent).

Strategy (see ops/psroi_align.py for the math): position-sensitive
RoI-align pooling factorizes into separable triangular-kernel contractions

    out[r, i, j, c] = (1/S^2) * sum_p WY[r,i,p] * sum_q WX[r,j,q]
                                 * feat[p, q, (i*k+j), c]

The XLA einsum implementation materializes an ``[R, k, W, k, C]``
intermediate in HBM twice; this kernel keeps everything on-chip and is built
from Mosaic-friendly **2-D ops only** (no in-kernel reshapes/relayouts):

  * features arrive pre-arranged as ``[k*k, H, W*C]`` (one 2-D ``[H, W*C]``
    slab per position-sensitive group) and sit whole in VMEM (~4.9 MB at
    800 px);
  * each grid step handles BLOCK_R rois; interpolation weights are built
    in-kernel with integer ``broadcasted_iota``;
  * per bin (i, j):  row contraction = one MXU matmul
    ``[BLOCK_R, H] @ [H, W*C]``; the column contraction multiplies by the
    column-expanded x-weights elementwise and reduces strided channels with
    one constant 0/1 selector matmul ``[BLOCK_R, W*C] @ [W*C, C]``;
  * output [BLOCK_R, k, k, C] written with static bin indices.

Backward: ``jax.custom_vjp`` with the transposed contractions in plain XLA —
deterministic and atomic-free (the reference's CUDA backward used
``atomicAdd``; SURVEY.md §5 commits to deleting that nondeterminism).
Gradients flow to ``features`` only (rois are detached, standard).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x_detector_tpu.ops.psroi_align import _interp_weights, _sample_coords

BLOCK_R = 128


def _weights_in_kernel(lo, hi, grid: int, samples: int, extent: int,
                       repeat: int = 1):
    """[BLOCK_R] lo/hi -> [BLOCK_R, grid, extent * repeat] weights.

    With ``repeat > 1`` every weight is duplicated ``repeat`` times along
    the last axis (column-expanded: w[..., q*repeat + c] = w[..., q]) so it
    can multiply a ``[*, W*C]`` slab elementwise without any reshape.
    """
    br = lo.shape[0]
    span = (hi - lo) / grid                                   # [br]
    cell = jax.lax.broadcasted_iota(
        jnp.int32, (br, grid, samples), 1).astype(jnp.float32)
    sub = (jax.lax.broadcasted_iota(
        jnp.int32, (br, grid, samples), 2).astype(jnp.float32)
        + 0.5) / samples
    norm = lo[:, None, None] + (cell + sub) * span[:, None, None]
    px = jnp.clip(norm * extent - 0.5, 0.0, extent - 1.0)     # [br, g, S]
    pix = (jax.lax.broadcasted_iota(
        jnp.int32, (br, grid, samples, extent * repeat), 3) // repeat
    ).astype(jnp.float32)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(pix - px[..., None]))
    return wgt.sum(axis=2)                                    # [br, g, E*rep]


def _sample_px(lo, hi, grid: int, samples: int, extent: int):
    """[BLOCK_R] lo/hi -> clamped continuous pixel coords [br, grid, S]."""
    br = lo.shape[0]
    span = (hi - lo) / grid
    cell = jax.lax.broadcasted_iota(
        jnp.int32, (br, grid, samples), 1).astype(jnp.float32)
    sub = (jax.lax.broadcasted_iota(
        jnp.int32, (br, grid, samples), 2).astype(jnp.float32)
        + 0.5) / samples
    norm = lo[:, None, None] + (cell + sub) * span[:, None, None]
    return jnp.clip(norm * extent - 0.5, 0.0, extent - 1.0)


def _expand_weights_one_bin(px_j, extent: int, repeat: int):
    """px_j [br, S] -> column-expanded weights [br, extent*repeat]."""
    br, samples = px_j.shape
    pix = (jax.lax.broadcasted_iota(
        jnp.int32, (br, samples, extent * repeat), 2) // repeat
    ).astype(jnp.float32)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(pix - px_j[..., None]))
    return wgt.sum(axis=1)


def _psroi_kernel(rois_ref, feat_ref, sel_ref, out_ref, *, grid: int,
                  samples: int, channels: int, height: int, width: int):
    """One grid step = BLOCK_R rois.  Per row-bin i: ONE MXU matmul against
    the concatenation of that row's ``grid`` column-bin slabs
    ([H, grid*W*C]), then elementwise x-weights and one selector matmul that
    reduces over both q and j at once."""
    rois = rois_ref[:]                                        # [BLOCK_R, 4]
    wy = _weights_in_kernel(rois[:, 0], rois[:, 2], grid, samples, height)
    px_x = _sample_px(rois[:, 1], rois[:, 3], grid, samples, width)
    sel = sel_ref[:]                                          # [g*W*C, g*C]
    inv = 1.0 / float(samples * samples)
    wc = width * channels
    for i in range(grid):
        wy_i = wy[:, i, :]                                    # [br, H]
        slab_row = feat_ref[i]                                # [H, g*W*C]
        a = jax.lax.dot(wy_i, slab_row,
                        preferred_element_type=jnp.float32)   # [br, g*W*C]
        # x-weights expanded one column-bin at a time (bounds VMEM):
        m_parts = [
            a[:, j * wc:(j + 1) * wc] *
            _expand_weights_one_bin(px_x[:, j, :], width, channels)
            for j in range(grid)]
        m = jnp.concatenate(m_parts, axis=1)                  # [br, g*W*C]
        pooled = jax.lax.dot(m, sel,
                             preferred_element_type=jnp.float32) * inv
        for j in range(grid):                                 # [br, g*C]
            out_ref[:, i, j, :] = pooled[:, j * channels:(j + 1) * channels]


def _psroi_pallas_raw(features: jnp.ndarray, rois: jnp.ndarray,
                      grid: int, samples: int) -> jnp.ndarray:
    h, w, kkc = features.shape
    c = kkc // (grid * grid)
    r = rois.shape[0]
    pad = (-r) % BLOCK_R
    if pad:
        rois = jnp.concatenate(
            [rois, jnp.zeros((pad, 4), rois.dtype)], axis=0)
    rp = r + pad

    # [H, W, k(i)*k(j), C] -> [k(i), H, k(j)*W*C] row slabs (one XLA
    # transpose, outside the kernel).
    feat = (features.reshape(h, w, grid, grid, c)
            .transpose(2, 0, 3, 1, 4).reshape(grid, h, grid * w * c)
            .astype(jnp.float32))
    # constant selector reducing q (stride C) within each j block:
    # sel[j*W*C + q*C + c0, j*C + c] = (c0 == c)
    sel = jnp.asarray(np.kron(np.eye(grid, dtype=np.float32),
                              np.tile(np.eye(c, dtype=np.float32), (w, 1))))

    kernel = functools.partial(_psroi_kernel, grid=grid, samples=samples,
                               channels=c, height=h, width=w)
    out = pl.pallas_call(
        kernel,
        grid=(rp // BLOCK_R,),
        in_specs=[
            pl.BlockSpec((BLOCK_R, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grid, h, grid * w * c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grid * w * c, grid * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_R, grid, grid, c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, grid, grid, c), jnp.float32),
    )(rois.astype(jnp.float32), feat, sel)
    return out[:r] if pad else out


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
    ys = _sample_coords(rois.astype(jnp.float32), grid, samples, h, 0, 2)
    xs = _sample_coords(rois.astype(jnp.float32), grid, samples, w, 1, 3)
    wy = _interp_weights(ys, h)                               # [R, k, H]
    wx = _interp_weights(xs, w)                               # [R, k, W]
    scale = 1.0 / float(samples * samples)
    # d feat[p,q,(i,j),c] = sum_r wy[r,i,p] * wx[r,j,q] * g[r,i,j,c]
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
