"""Pallas TPU kernel for PSROIAlign (SURVEY.md §2.5 O1/O2 equivalent).

Strategy (see ops/psroi_align.py for the math): position-sensitive
RoI-align pooling factorizes into separable triangular-kernel contractions

    out[r, i, j, c] = (1/S^2) * sum_p WY[r,i,p] * sum_q WX[r,j,q]
                                 * feat[p, q, (i*k+j), c]

This kernel keeps everything on-chip with Mosaic-friendly 2-D ops only:

  * features arrive pre-arranged as ``[k(i), H, k(j)*C*W]`` row slabs
    (W minor within each (j, c) block) and sit whole in VMEM (~4.9 MB at
    800 px);
  * each grid step handles BLOCK_R rois; compact interpolation weights are
    built in-kernel with integer ``broadcasted_iota``; the x-weights expand
    to the slab layout by lane **concatenation** (tiling — no per-element
    index arithmetic);
  * per row-bin i: ONE MXU matmul ``[BLOCK_R, H] @ [H, k*C*W]`` contracts
    the rows of all of that row's column bins at once, then an elementwise
    multiply and one constant 0/1 selector matmul ``[k*C*W, k*C]`` reduce
    over q for every (j, c) simultaneously.

Design history (all raced on a real v5e, batch 16 x 1000 rois on
50x50x490 maps): v1 per-bin matmuls + in-kernel weight interleaving
(8.2 ms, VMEM-OOM at first), v2 [g,H,C*W] slabs with tiled weights
(7.0 ms), v3 = this layout (~7.1 ms, one matmul per row-bin).  The XLA
separable-einsum formulation measures 6.4-7.9 ms on the same inputs and
wins the interleaved A/B by ~5%, so it remains the production path
(SURVEY §7: "only keep if faster"); this kernel is kept as a correct,
tested alternative and the base for further VMEM-resident work
(docs/ROADMAP.md item 5).

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

BLOCK_R = 256


def _weights_in_kernel(lo, hi, grid: int, samples: int, extent: int):
    """[BLOCK_R] lo/hi -> compact [BLOCK_R, grid, extent] weights (iota is
    integer-typed: TPU has no float iota)."""
    br = lo.shape[0]
    span = (hi - lo) / grid
    cell = jax.lax.broadcasted_iota(
        jnp.int32, (br, grid, samples), 1).astype(jnp.float32)
    sub = (jax.lax.broadcasted_iota(
        jnp.int32, (br, grid, samples), 2).astype(jnp.float32)
        + 0.5) / samples
    norm = lo[:, None, None] + (cell + sub) * span[:, None, None]
    px = jnp.clip(norm * extent - 0.5, 0.0, extent - 1.0)
    pix = jax.lax.broadcasted_iota(
        jnp.int32, (br, grid, samples, extent), 3).astype(jnp.float32)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(pix - px[..., None]))
    return wgt.sum(axis=2)


def _psroi_kernel(rois_ref, feat_ref, sel_ref, out_ref, *, grid: int,
                  samples: int, channels: int, height: int, width: int,
                  op_dtype=jnp.float32):
    rois = rois_ref[:]                                        # [BLOCK_R, 4]
    wy = _weights_in_kernel(rois[:, 0], rois[:, 2], grid, samples, height)
    wx = _weights_in_kernel(rois[:, 1], rois[:, 3], grid, samples, width)
    wy = wy.astype(op_dtype)
    wx = wx.astype(op_dtype)   # cast BEFORE the big concatenate: the
    # expanded [br, g*C*W] buffer is the kernel's largest intermediate
    # (12.5 MB fp32 at config-3 shapes) and dominates the VMEM stack.
    # expand to the slab layout [br, g*C*W] by pure lane concatenation
    wxe = jnp.concatenate(
        [wx[:, j, :] for j in range(grid) for _ in range(channels)], axis=1)
    sel = sel_ref[:]                                          # [g*C*W, g*C]
    inv = 1.0 / float(samples * samples)
    for i in range(grid):
        # In bf16 mode the row-contraction emits bf16 (the MXU still
        # accumulates fp32 internally — same numerics as the einsum path's
        # fp32-accumulate-then-cast); the [br, g*C*W] intermediate is the
        # VMEM-stack limiter, so its dtype decides whether the kernel fits.
        a = jax.lax.dot(wy[:, i, :], feat_ref[i],
                        preferred_element_type=jnp.float32)   # [br, g*C*W]
        a = a.astype(op_dtype)
        pooled = jax.lax.dot(a * wxe, sel,
                             preferred_element_type=jnp.float32) * inv
        for j in range(grid):
            out_ref[:, i, j, :] = pooled[:, j * channels:(j + 1) * channels]


def _psroi_pallas_raw(features: jnp.ndarray, rois: jnp.ndarray,
                      grid: int, samples: int,
                      op_dtype=jnp.float32) -> jnp.ndarray:
    h, w, kkc = features.shape
    c = kkc // (grid * grid)
    r = rois.shape[0]
    pad = (-r) % BLOCK_R
    if pad:
        rois = jnp.concatenate(
            [rois, jnp.zeros((pad, 4), rois.dtype)], axis=0)
    rp = r + pad

    # [H, W, k(i), k(j), C] -> [k(i), H, k(j), C, W] -> row slabs
    feat = (features.reshape(h, w, grid, grid, c)
            .transpose(2, 0, 3, 4, 1).reshape(grid, h, grid * c * w)
            .astype(op_dtype))
    # selector summing over the W-minor blocks: sel[(j,c0)*W + q, (j,c)] =
    # (c0 == c within the same j)
    sel = jnp.asarray(np.kron(np.eye(grid * c, dtype=np.float32),
                              np.ones((w, 1), np.float32)), dtype=op_dtype)

    kernel = functools.partial(_psroi_kernel, grid=grid, samples=samples,
                               channels=c, height=h, width=w,
                               op_dtype=op_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(rp // BLOCK_R,),
        in_specs=[
            pl.BlockSpec((BLOCK_R, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grid, h, grid * c * w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grid * c * w, grid * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_R, grid, grid, c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, grid, grid, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # the [BLOCK_R, g*C*W] intermediates exceed the 16 MiB default
            # scoped-vmem budget at config-3 shapes; the physical VMEM is
            # 128 MiB, so raise the scoped limit instead of shrinking blocks
            vmem_limit_bytes=48 * 1024 * 1024),
    )(rois.astype(jnp.float32), feat, sel)
    return out[:r] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def psroi_align_pallas(features: jnp.ndarray, rois: jnp.ndarray,
                       grid: int = 7, samples: int = 2,
                       precise: bool = True) -> jnp.ndarray:
    """Pallas PSROIAlign: [H, W, k*k*C] x [R, 4] -> [R, k, k, C] (fp32 out).

    ``precise=False`` runs the in-kernel dots in bf16 (full MXU rate; the
    interpolation weights are representable to ~3 decimal digits, matching
    the production einsum path's numerics policy).
    """
    return _psroi_pallas_raw(features, rois, grid, samples,
                             jnp.float32 if precise else jnp.bfloat16)


def _fwd(features, rois, grid, samples, precise):
    return (_psroi_pallas_raw(features, rois, grid, samples,
                              jnp.float32 if precise else jnp.bfloat16),
            (features, rois))


def _bwd(grid, samples, precise, res, g):
    features, rois = res
    h, w, kkc = features.shape
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
                               grid: int = 7, samples: int = 2,
                               precise: bool = True) -> jnp.ndarray:
    """vmap over batch: [B, H, W, k*k*C] x [B, R, 4] -> [B, R, k, k, C]."""
    fn = functools.partial(psroi_align_pallas, grid=grid, samples=samples,
                           precise=precise)
    return jax.vmap(fn)(features, rois)
