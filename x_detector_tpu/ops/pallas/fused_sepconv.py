"""Fused depthwise-separable conv block: dw3x3 -> 1x1 -> BN affine -> ReLU.

The one measured perf frontier left on BASELINE config 3 (round-4 verdict
item 5).  Xception-lite's building block is a depthwise 3x3 followed by a
pointwise 1x1 (models/layers.SeparableConvBN, rebuilding SURVEY.md §2.4
N2's separable blocks); XLA fuses elementwise epilogues into convolutions
but never fuses conv -> conv, so the depthwise intermediate ``t``
([B, H, W, C] — as large as the input) round-trips HBM between the two:

    naive:  read x, write t, read t, write y      (4 activation passes)
    fused:  read x,                 write y       (2 activation passes)

DESIGN §11/§14 established the backbone is HBM-bandwidth-bound (depthwise
never touches the MXU; every bf16 lever sits at 1.06-1.44x its bandwidth
floor), so halving activation traffic on 14 of the backbone's 16 separable
convs is the one transform that attacks the binding constraint directly —
int8 (§20), act8 (§20), remat (§17) and dense reparameterization (§11) all
measured out.

Kernel shape (one grid step = one [TH, W] row-band of one image):

  * ``x`` stays in HBM (``pl.ANY``); each step DMAs its row band plus a
    ``d``-row halo (d = dilation) into a VMEM scratch ``[TH + 2d, W, C]``;
    boundary bands land at a ``d``-row offset with the off-image rows
    zeroed (SAME padding in H).  All DMA offsets live in the untiled
    row dim — Mosaic requires offsets in the (8, 128)-tiled W/C dims to
    be tile-aligned, which is also why
  * the 9 depthwise taps slice only rows; the W offsets are sublane
    ROTATES (``pltpu.roll``) + iota masks (SAME padding in W), FMA'd on
    the VPU with fp32 accumulation — identical index arithmetic for
    interior and boundary bands;
  * the pointwise conv is ONE MXU matmul ``[TH*W, Cin] @ [Cin, Cout]``
    (bf16 operands, fp32 accumulation), with the folded BN affine
    (inference BatchNorm2D: per-channel scale+bias) and optional ReLU
    applied to the fp32 accumulator before the single cast+store.

Stride-2 entry convs (2 of 16 in the judged backbone) keep the unfused
path: their intermediate is 4x smaller, so the fusion win is marginal and
the kernel stays simple.  Training also keeps the unfused path — this op
is inference-only (no VJP), wired behind ``ModelConfig.
backbone_fused_sepconv`` via SeparableConvBN(fused=True).

The reference implementation (`reference_separable_conv`) is the exact
lax formulation used for parity tests and as the dispatch fallback for
shapes the kernel does not support (odd H, H < 4: tiny-test territory,
never the judged configs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def reference_separable_conv(x, wd, wp, scale, bias, *, dilation=1,
                             relu=True, residual=None):
    """Unfused lax formulation: dw3x3 (SAME) -> 1x1 -> affine [-> +residual]
    -> relu.

    ``wd``: [3, 3, C] depthwise taps; ``wp``: [C, Cout]; ``scale``/
    ``bias``: [Cout] folded BN affine (fp32).  Matches the production
    SeparableConvBN inference path op-for-op.  ``residual`` ([B, H, W,
    Cout]) is the Xception unit's shortcut, added after the affine and
    before the (then mandatory) ReLU.
    """
    c = x.shape[-1]
    t = lax.conv_general_dilated(
        x, wd.reshape(3, 3, 1, c).astype(x.dtype), (1, 1), "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    y = lax.conv_general_dilated(
        t, wp[None, None].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    if residual is not None:
        y = y + residual.astype(y.dtype)
    return jnp.maximum(y, 0) if relu else y


def _pick_band(h: int, w: int, cin: int, cout: int, d: int):
    """Largest row-band TH that divides H with >= 2 bands and fits the
    VMEM working set (scratch + fp32 acc + matmul out + double-buffered
    output block; physical VMEM is 128 MiB on v5e — psroi_align_kernel —
    but a modest footprint leaves the pipeline slack)."""
    budget = 20 * 1024 * 1024
    for th in (32, 25, 20, 16, 10, 8, 5, 4, 2):
        # th + 2d <= h: the interior-band DMA's STATIC slice size must fit
        # the image even when the branch is dead (trace-time requirement —
        # caught driving the full backbone on a 64x64 input, whose dilated
        # stage maps to h=4, d=2).
        if h % th or h // th < 2 or th + 2 * d > h:
            continue
        vmem = ((th + 2 * d) * (w + 2 * d) * cin * 2     # xbuf bf16
                + th * w * cin * 4                       # fp32 dw acc
                + th * w * cin * 2                       # bf16 matmul lhs
                + th * w * cout * 4                      # fp32 matmul acc
                + 2 * th * w * cout * 2                  # out block x2
                + cin * cout * 2)                        # wp
        if vmem <= budget:
            return th
    return None


def _kernel(x_hbm, wd_ref, wp_ref, sb_ref, *rest,
            th: int, d: int, h: int, w: int, relu: bool,
            has_residual: bool):
    if has_residual:
        res_ref, out_ref, xbuf, sem = rest
    else:
        (out_ref, xbuf, sem), res_ref = rest, None
    b = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.num_programs(1)

    # --- load the row band + halo (static-size DMAs; 3 boundary cases).
    # Row offsets live in the UNTILED leading dim, so any offset is legal;
    # the W/C dims are always copied whole (Mosaic requires slice offsets
    # in the (8, 128)-tiled dims to be tile-aligned — the first version
    # DMA'd into a d-column W margin and failed exactly that check).
    @pl.when(jnp.logical_and(i > 0, i < n - 1))
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * th - d, th + 2 * d)], xbuf, sem)
        cp.start()
        cp.wait()

    @pl.when(i == 0)
    def _():
        xbuf[0:d] = jnp.zeros_like(xbuf[0:d])     # top image margin
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(0, th + d)],
            xbuf.at[pl.ds(d, th + d)], sem)
        cp.start()
        cp.wait()

    @pl.when(i == n - 1)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(h - th - d, th + d)],
            xbuf.at[pl.ds(0, th + d)], sem)
        cp.start()
        cp.wait()
        xbuf[th + d:] = jnp.zeros_like(xbuf[th + d:])   # bottom margin

    # --- depthwise 3x3 on the VPU (fp32 accumulation) ------------------
    # Output row r reads xbuf[r + t*d] for tap t: the boundary DMAs write
    # at a d-row offset, which makes this index arithmetic uniform across
    # interior and boundary bands (the zeroed margins supply SAME padding
    # in H).  W taps use roll + iota masks instead of slices: a W slice at
    # offset d is a non-tile-aligned sublane access Mosaic rejects, while
    # a sublane rotate + select is native VPU work.
    cin = xbuf.shape[-1]
    acc = jnp.zeros((th, w, cin), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (th, w, cin), 1)
    for t in range(3):
        rows = xbuf[t * d:t * d + th].astype(jnp.float32)
        for j in range(3):
            sh = (j - 1) * d                      # tap column offset
            if sh == 0:
                seg = rows
            else:
                # circular: seg[:, k] = rows[:, k+sh]; roll wants shift >= 0
                seg = pltpu.roll(rows, (-sh) % w, axis=1)
                seg = jnp.where(
                    jnp.logical_and(col + sh >= 0, col + sh < w), seg, 0.0)
            acc += seg * wd_ref[t, j].astype(jnp.float32)

    # --- pointwise 1x1 on the MXU + folded-BN epilogue, one store ---
    lhs = acc.astype(out_ref.dtype).reshape(th * w, cin)
    y = jnp.dot(lhs, wp_ref[...].astype(out_ref.dtype),
                preferred_element_type=jnp.float32)
    y = y * sb_ref[0] + sb_ref[1]
    if has_residual:
        # Xception-unit shortcut fused into the epilogue: spares the
        # separate add+relu elementwise pass (a full read+write of y).
        y = y + res_ref[...].reshape(th * w, -1).astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[...] = y.reshape(1, th, w, -1).astype(out_ref.dtype)


def fused_separable_conv(x, wd, wp, scale, bias, *, dilation=1, relu=True,
                         residual=None, interpret=None):
    """relu((dw3x3(x; SAME, dilation) conv1x1 wp) * scale + bias [+ res]).

    ``x`` [B, H, W, Cin] (bf16 on the production path); ``wd`` [3, 3, Cin]
    fp32 depthwise taps; ``wp`` [Cin, Cout] fp32; ``scale``/``bias``
    [Cout] fp32 (inference-folded BatchNorm2D affine); ``residual``
    optional [B, H, W, Cout] shortcut added before the ReLU (the Xception
    unit epilogue — fusing it spares the separate add+relu pass).
    Returns [B, H, W, Cout] in ``x.dtype``.

    Falls back to the exact lax formulation when no whole row-band tiling
    exists (odd/tiny H — test-sized shapes, never the judged configs) or
    when running on CPU without interpret mode available.
    """
    b, h, w, cin = x.shape
    cout = wp.shape[-1]
    d = int(dilation)
    assert wd.shape == (3, 3, cin), wd.shape
    th = _pick_band(h, w, cin, cout, d)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if th is None:
        return reference_separable_conv(x, wd, wp, scale, bias,
                                        dilation=d, relu=relu,
                                        residual=residual)
    sb = jnp.stack([scale, bias]).astype(jnp.float32)       # [2, Cout]
    grid = (b, h // th)
    kernel = functools.partial(_kernel, th=th, d=d, h=h, w=w, relu=relu,
                               has_residual=residual is not None)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),                  # x: HBM
        pl.BlockSpec(memory_space=pltpu.VMEM),              # wd
        pl.BlockSpec(memory_space=pltpu.VMEM),              # wp
        pl.BlockSpec(memory_space=pltpu.VMEM),              # scale/bias
    ]
    operands = [x, jnp.asarray(wd, jnp.float32), wp, sb]
    if residual is not None:
        assert residual.shape == (b, h, w, cout), residual.shape
        in_specs.append(pl.BlockSpec((1, th, w, cout),
                                     lambda bb, ii: (bb, ii, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(residual.astype(x.dtype))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, cout),
                               lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * d, w, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # scratch persists across grid steps (the zero-once W margins
            # depend on it) -> the grid must stay sequential
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * cin * (9 + cout),
            bytes_accessed=(b * h * w * (cin + cout)) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*operands)
