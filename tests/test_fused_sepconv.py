"""Fused separable-conv Pallas kernel (ops/pallas/fused_sepconv.py).

Contracts:
  - the kernel matches the exact lax formulation (dw3x3 SAME -> 1x1 ->
    affine -> relu) for interior AND boundary row bands, both dilations;
  - SeparableConvBN(fused=True) matches the unfused module on the SAME
    variables at inference (checkpoints load unchanged: identical trees);
  - the full XceptionLite backbone agrees fused vs unfused;
  - training calls keep the standard path (grads + BN stats still work);
  - requesting the fusion on a ResNet backbone is an error, not a no-op.

On CPU the op runs in Pallas interpret mode (same kernel code path the
TPU compiles); shapes with no whole row-band tiling fall back to the lax
reference, which these parity tests also cover.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x_detector_tpu.models.layers import SeparableConvBN
from x_detector_tpu.models.xception import XceptionLite
from x_detector_tpu.ops.pallas.fused_sepconv import (
    _pick_band, fused_separable_conv, reference_separable_conv)


@pytest.mark.parametrize("dilation,relu", [(1, True), (1, False),
                                           (2, True), (2, False)])
def test_kernel_matches_reference(dilation, relu):
    b, h, w, cin, cout = 2, 16, 11, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.float32)
    wd = jax.random.normal(ks[1], (3, 3, cin), jnp.float32) * 0.3
    wp = jax.random.normal(ks[2], (cin, cout), jnp.float32) * 0.2
    scale = jax.random.normal(ks[3], (cout,)) * 0.5 + 1.0
    bias = jax.random.normal(ks[4], (cout,)) * 0.1
    assert _pick_band(h, w, cin, cout, dilation) is not None  # kernel path
    ref = reference_separable_conv(x, wd, wp, scale, bias,
                                   dilation=dilation, relu=relu)
    out = fused_separable_conv(x, wd, wp, scale, bias,
                               dilation=dilation, relu=relu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tiny_dilated_map_matches_reference():
    """h=4, d=2 (a 64x64 input's dilated stage): v2's halo DMA over-read
    this shape at trace time; v3's carry-ring covers it with a single
    band whose halos are both image boundaries (caught driving the full
    backbone, round 5)."""
    b, h, w, cin, cout = 1, 4, 4, 8, 8
    assert _pick_band(h, w, cin, cout, 2) is not None
    ks = jax.random.split(jax.random.PRNGKey(8), 5)
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.float32)
    wd = jax.random.normal(ks[1], (3, 3, cin), jnp.float32)
    wp = jax.random.normal(ks[2], (cin, cout), jnp.float32)
    ref = reference_separable_conv(x, wd, wp, jnp.ones(cout),
                                   jnp.zeros(cout), dilation=2)
    out = fused_separable_conv(x, wd, wp, jnp.ones(cout), jnp.zeros(cout),
                               dilation=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_fallback_shapes_match_reference():
    """Odd H has no whole row-band tiling -> the lax fallback serves the
    same contract."""
    b, h, w, cin, cout = 1, 7, 5, 4, 8
    assert _pick_band(h, w, cin, cout, 1) is None
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.float32)
    wd = jax.random.normal(ks[1], (3, 3, cin), jnp.float32)
    wp = jax.random.normal(ks[2], (cin, cout), jnp.float32)
    scale = jnp.ones((cout,))
    bias = jnp.zeros((cout,))
    ref = reference_separable_conv(x, wd, wp, scale, bias)
    out = fused_separable_conv(x, wd, wp, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_module_fused_matches_unfused_same_variables():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 8),
                          jnp.float32) * 2.0
    mod = SeparableConvBN(12, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    # perturb BN stats away from init so the folded affine is non-trivial
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype
                                        ).reshape(a.shape) / a.size,
        variables)
    fused = dataclasses.replace(mod, fused=True)
    # identical trees: trained checkpoints load unchanged
    ref_tree = jax.tree_util.tree_structure(variables)
    fused_tree = jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(0), x))
    assert ref_tree == fused_tree
    ref = mod.apply(variables, x, train=False)
    out = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("relu,dilation", [(True, (1, 1)), (False, (2, 2))])
def test_module_fused_variants(relu, dilation):
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 8), jnp.float32)
    mod = SeparableConvBN(8, relu=relu, dilation=dilation,
                          dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(variables, x, train=False)
    out = dataclasses.replace(mod, fused=True).apply(variables, x,
                                                     train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dilation", [1, 2])
def test_kernel_residual_epilogue_matches_reference(dilation):
    """v2: the Xception unit's add+relu fused into the kernel epilogue."""
    b, h, w, cin, cout = 2, 16, 9, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(6), 6)
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.float32)
    wd = jax.random.normal(ks[1], (3, 3, cin), jnp.float32) * 0.3
    wp = jax.random.normal(ks[2], (cin, cout), jnp.float32) * 0.2
    scale = jax.random.normal(ks[3], (cout,)) * 0.5 + 1.0
    bias = jax.random.normal(ks[4], (cout,)) * 0.1
    res = jax.random.normal(ks[5], (b, h, w, cout), jnp.float32)
    assert _pick_band(h, w, cin, cout, dilation) is not None
    ref = reference_separable_conv(x, wd, wp, scale, bias,
                                   dilation=dilation, relu=True,
                                   residual=res)
    out = fused_separable_conv(x, wd, wp, scale, bias, dilation=dilation,
                               relu=True, residual=res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_module_residual_fused_matches_unfused():
    """SeparableConvBN(relu=False) with a residual: fused output matches
    the unfused relu(bn(convs(x)) + residual) on the same variables."""
    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    x = jax.random.normal(ks[0], (2, 16, 16, 8), jnp.float32)
    res = jax.random.normal(ks[1], (2, 16, 16, 8), jnp.float32)
    mod = SeparableConvBN(8, relu=False, dtype=jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(v, x, train=False, residual=res)
    # the unfused residual routing equals the historical stage formulation
    manual = jnp.maximum(mod.apply(v, x, train=False) + res, 0.0)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(manual))
    out = dataclasses.replace(mod, fused=True).apply(v, x, train=False,
                                                     residual=res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_module_fused_stride2_and_train_keep_standard_path():
    """Stride-2 and training calls must be bit-identical to the unfused
    module (the fused branch only covers inference at stride 1)."""
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 8), jnp.float32)
    s2 = SeparableConvBN(8, strides=(2, 2), dtype=jnp.float32)
    v = s2.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(
        np.asarray(s2.apply(v, x, train=False)),
        np.asarray(dataclasses.replace(s2, fused=True).apply(
            v, x, train=False)))
    s1 = SeparableConvBN(8, dtype=jnp.float32)
    v = s1.init(jax.random.PRNGKey(0), x)
    ref, mref = s1.apply(v, x, train=True, mutable=["batch_stats"])
    out, mout = dataclasses.replace(s1, fused=True).apply(
        v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    for a, b in zip(jax.tree_util.tree_leaves(mref),
                    jax.tree_util.tree_leaves(mout)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_backbone_fused_matches_unfused():
    """End-to-end XceptionLite: every stride-1 separable block fused, all
    three pyramid outputs agree with the standard path."""
    bb = XceptionLite(widths=(8, 16, 24, 32), units_per_stage=(1, 1, 1, 1),
                      dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 32, 32, 3),
                           jnp.float32, maxval=255.0)
    variables = bb.init(jax.random.PRNGKey(0), x)
    fused = dataclasses.replace(bb, fused_sepconv=True)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(
                fused.init(jax.random.PRNGKey(0), x)))
    ref = bb.apply(variables, x, train=False)
    out = fused.apply(variables, x, train=False)
    for k in ("c3", "c4", "c5"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-4)


def test_fused_sepconv_rejects_resnet():
    from x_detector_tpu.config import lighthead_resnet50
    from x_detector_tpu.models.ssd import make_backbone
    cfg = dataclasses.replace(lighthead_resnet50().model,
                              backbone_fused_sepconv=True)
    with pytest.raises(ValueError, match="fused_sepconv"):
        make_backbone(cfg, dilate_c5=True, dtype=jnp.float32)