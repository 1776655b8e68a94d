"""Fused depthwise-separable conv block: dw3x3 -> 1x1 -> BN affine -> ReLU.

The one measured perf frontier left on BASELINE config 3 (round-4 verdict
item 5).  **STATUS: BUILT, MEASURED, BURIED — kept in-tree as the measured
negative result (DESIGN §23).**  The working hypothesis was that XLA fuses
elementwise epilogues into convolutions but never fuses conv -> conv, so
the depthwise intermediate ``t`` ([B, H, W, C] — as large as the input)
round-trips HBM between the dw3x3 and the 1x1:

    naive:  read x, write t, read t, write y      (4 activation passes)
    fused:  read x,                 write y       (2 activation passes)

The hypothesis is FALSE on this backend, by measurement: the unfused XLA
pair runs the config-3 stage-2 shape at 0.21 ms — *below* the 0.40 ms
four-pass floor and at the 0.20 ms two-pass floor — i.e. XLA's TPU
backend already elides the depthwise intermediate when it feeds a 1x1
(the dw taps are computed as part of reading the matmul operand).  The
e2e race measured the fused backbone at 0.72x the unfused one, and the
residual per-stage slack (stages 3-4 sit 2.3-2.9x over the two-pass
floor) bounds any perfect kernel's e2e win at ~3%.  Full roofline table
and burial rationale: DESIGN §23; raw logs
docs/artifacts/r5/fused_sepconv_race*.log.

Kernel shape (v3 — the carry-ring; one grid step retires one [TH, W]
row-band of one image, the grid runs one extra step per image):

  * ``x`` is loaded band-by-band through a plain Blocked BlockSpec —
    Mosaic's pipeline machinery accepts any W (measured: blocked copies
    of W=100 blocks compile; manual ``make_async_copy`` of the same
    shape is rejected unless W % 8 == 0, which killed v2 on the judged
    config-3 stages, W in {100, 50}).  Halos never cross a DMA: the
    kernel keeps a VMEM ring of the previous band and the ``d``-row
    tail of the band before it, assembles the halo'd working band
    ``[TH + 2d, W, C]`` from {tail, prev, head-of-current} with row-dim
    VMEM copies (row slices live in the untiled leading dim — always
    legal), and computes output band ``i-1`` while band ``i`` streams
    in.  Image-boundary rows are zeroed (SAME padding in H).
  * the 9 depthwise taps slice only rows; the W offsets are sublane
    ROTATES (``pltpu.roll``) + iota masks (SAME padding in W), FMA'd on
    the VPU with fp32 accumulation.  Rolls are exact for ANY logical W
    including wrap-around (probed on hardware at W=100: padded sublanes
    do not leak), and wrapped lanes are masked anyway.
  * the pointwise conv is ONE MXU matmul ``[TH*W, Cin] @ [Cin, Cout]``
    (bf16 operands, fp32 accumulation), with the folded BN affine
    (inference BatchNorm2D: per-channel scale+bias), the optional
    Xception-unit residual, and the ReLU applied to the fp32
    accumulator before the single cast+store.

Stride-2 entry convs (2 of 16 in the judged backbone) keep the unfused
path: their intermediate is 4x smaller, so the fusion win is marginal and
the kernel stays simple.  Training also keeps the unfused path — this op
is inference-only (no VJP), wired behind ``ModelConfig.
backbone_fused_sepconv`` via SeparableConvBN(fused=True).

The reference implementation (`reference_separable_conv`) is the exact
lax formulation used for parity tests and as the dispatch fallback for
shapes with no whole row-band tiling (odd/prime H: tiny-test territory,
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
    """Largest row-band TH that divides H and fits the VMEM working set
    (double-buffered in/out blocks + ring carries + fp32 accumulators;
    physical VMEM is 128 MiB on v5e — psroi_align_kernel — but a modest
    footprint leaves the pipeline slack)."""
    budget = 24 * 1024 * 1024
    for th in (32, 25, 20, 16, 10, 8, 5, 4, 2):
        if h % th:
            continue
        vmem = (2 * th * w * cin * 2          # x block, double-buffered
                + 2 * th * w * cout * 2       # out block, double-buffered
                + (th + 2 * d) * w * cin * 2  # assembled halo'd band
                + th * w * cin * 2            # ring: prev band
                + d * w * cin * 2             # ring: tail of band j-1
                + th * w * cin * 4            # fp32 dw accumulator
                + th * w * cout * 4           # fp32 matmul accumulator
                + cin * cout * 2)             # wp
        if vmem <= budget:
            return th
    return None


def _kernel(wd_ref, wp_ref, sb_ref, x_ref, *rest,
            th: int, d: int, h: int, w: int, relu: bool,
            has_residual: bool):
    if has_residual:
        res_ref, out_ref, xbuf, prev, tail = rest
    else:
        (out_ref, xbuf, prev, tail), res_ref = rest, None
    i = pl.program_id(1)
    n = pl.num_programs(1) - 1                # n bands; grid runs n+1 steps
    j = i - 1                                 # band retired this step

    # --- assemble the halo'd band [TH + 2d, W, C] and compute band j ---
    @pl.when(i > 0)
    def _():
        zeros_d = jnp.zeros((d, w, xbuf.shape[-1]), xbuf.dtype)
        xbuf[0:d] = jnp.where(j > 0, tail[...], zeros_d)
        xbuf[d:d + th] = prev[...]
        # x_ref holds band min(i, n-1): band j+1 for interior steps, band
        # n-1 (== j) on the flush step, where the bottom halo is off-image
        xbuf[d + th:] = jnp.where(j < n - 1, x_ref[0, 0:d], zeros_d)

        # depthwise 3x3 on the VPU (fp32 accumulation).  Output row r
        # reads xbuf[r + t*d] for tap t — row slices are untiled-dim
        # accesses.  W taps: sublane rotate + iota mask (SAME in W).
        # The 9 taps are restructured as 3 column planes: combine the 3
        # row taps per column offset FIRST (plain FMAs), then shift each
        # combined plane once — 2 rolls + 2 masks total instead of 6 + 6
        # (the rolls/masks are the kernel's dominant VPU cost; measured
        # ~1.5x on the e2e race).
        cin = xbuf.shape[-1]
        planes = [jnp.zeros((th, w, cin), jnp.float32) for _ in range(3)]
        for t in range(3):
            rows = xbuf[t * d:t * d + th].astype(jnp.float32)
            for jj in range(3):
                planes[jj] += rows * wd_ref[t, jj].astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (th, w, cin), 1)
        acc = planes[1]
        for jj in (0, 2):
            sh = (jj - 1) * d                 # tap column offset
            # seg[:, k] = plane[:, k+sh]; roll wants shift >= 0
            seg = pltpu.roll(planes[jj], (-sh) % w, axis=1)
            acc += jnp.where(
                jnp.logical_and(col + sh >= 0, col + sh < w), seg, 0.0)

        # pointwise 1x1 on the MXU + folded-BN epilogue, one store
        lhs = acc.astype(out_ref.dtype).reshape(th * w, cin)
        y = jnp.dot(lhs, wp_ref[...].astype(out_ref.dtype),
                    preferred_element_type=jnp.float32)
        y = y * sb_ref[0] + sb_ref[1]
        if has_residual:
            # Xception-unit shortcut fused into the epilogue: spares the
            # separate add+relu elementwise pass (a full read+write of y)
            y = y + res_ref[...].reshape(th * w, -1).astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[...] = y.reshape(1, th, w, -1).astype(out_ref.dtype)

    # --- advance the ring: tail <- prev's last d rows, prev <- band i ---
    # (reads before writes; at i == n the values are dead — the next step
    # is (b+1, 0), which reinitializes both carries)
    tail[...] = prev[th - d:th]
    prev[...] = x_ref[0]


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
    n = h // th
    grid = (b, n + 1)                         # one extra flush step/image
    kernel = functools.partial(_kernel, th=th, d=d, h=h, w=w, relu=relu,
                               has_residual=residual is not None)
    # Band j is computed at step j+1 from ring carries (bands j-1, j) plus
    # the head of the in-flight band j+1; the input index clamps to n-1 on
    # the flush step, the output index clamps to 0 on the fill step (its
    # garbage write is overwritten at step 1 before the block flushes —
    # the pipeline only writes back when the out index CHANGES).
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),              # wd
        pl.BlockSpec(memory_space=pltpu.VMEM),              # wp
        pl.BlockSpec(memory_space=pltpu.VMEM),              # scale/bias
        pl.BlockSpec((1, th, w, cin),
                     lambda bb, ii: (bb, jnp.minimum(ii, n - 1), 0, 0)),
    ]
    operands = [jnp.asarray(wd, jnp.float32), wp, sb, x]
    out_index = lambda bb, ii: (bb, jnp.maximum(ii - 1, 0), 0, 0)
    if residual is not None:
        assert residual.shape == (b, h, w, cout), residual.shape
        in_specs.append(pl.BlockSpec((1, th, w, cout), out_index))
        operands.append(residual.astype(x.dtype))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, cout), out_index),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * d, w, cin), x.dtype),      # halo'd band
            pltpu.VMEM((th, w, cin), x.dtype),              # ring: prev
            pltpu.VMEM((d, w, cin), x.dtype),               # ring: tail
        ],
        compiler_params=pltpu.CompilerParams(
            # the ring carries persist across grid steps -> sequential grid
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * cin * (9 + cout),
            bytes_accessed=(b * h * w * (cin + cout)) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*operands)
