"""int8 PTQ serving path (x_detector_tpu/quant.py + layers.QuantConv).

Round-4 build of DESIGN §19's measured lever. Contracts under test:
  - the quantized modules load UNCHANGED trained checkpoints (identical
    param trees — QuantConv replicates nn.Conv's auto-names);
  - "calibrate" mode's math is the production bf16 path (only adds range
    recording), so calibration never perturbs detections;
  - int8 conv output tracks the bf16 output within quantization error;
  - the full detector pipeline (both families) runs end to end with an
    int8 backbone and produces usable detections.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x_detector_tpu import quant
from x_detector_tpu.models.layers import ConvBN, SeparableConvBN
from x_detector_tpu.models.xception import XceptionLite


def _tree_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {(jax.tree_util.keystr(p), v.shape) for p, v in flat}


def test_quantconv_param_tree_matches_nn_conv():
    x = jnp.ones((1, 16, 16, 8))
    for mod in (ConvBN(12, (3, 3), strides=(2, 2), padding="EXPLICIT"),
                ConvBN(12, (1, 1), use_bn=False),
                SeparableConvBN(12),
                SeparableConvBN(12, dense=True)):
        normal = mod.init(jax.random.PRNGKey(0), x)
        qmod = dataclasses.replace(mod, quant="calibrate")
        quanted = qmod.init(jax.random.PRNGKey(0), x)
        assert _tree_paths(normal["params"]) == _tree_paths(
            quanted["params"]), type(mod).__name__
        assert "quant" in quanted


def test_calibrate_mode_matches_bf16_and_records_amax():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8),
                          jnp.float32) * 3.0
    mod = ConvBN(12, (3, 3))
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(variables, x)
    qmod = dataclasses.replace(mod, quant="calibrate")
    out, mut = qmod.apply(variables, x, mutable=["quant"])
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    amax = float(jax.tree_util.tree_leaves(mut["quant"])[0])
    assert abs(amax - float(jnp.max(jnp.abs(x)))) < 1e-5
    # running max: a second, smaller batch must not lower it
    _, mut2 = qmod.apply({**variables, **mut}, x * 0.1, mutable=["quant"])
    assert float(jax.tree_util.tree_leaves(mut2["quant"])[0]) == amax


def test_percentile_calibration_ignores_outliers():
    """'calibrate:p99' records the tail-clipped statistic: one injected hot
    pixel must dominate the amax scale but barely move the percentile one
    (round-4 verdict item 3 — the outlier-robust calibration option)."""
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 8),
                           jnp.float32)                    # |x| <= 1
    x = x.at[0, 3, 4, 2].set(1000.0)                       # hot pixel
    mod = ConvBN(12, (3, 3))
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(variables, x)

    qmod = dataclasses.replace(mod, quant="calibrate")
    out_a, mut_a = qmod.apply(variables, x, mutable=["quant"])
    amax = float(jax.tree_util.tree_leaves(mut_a["quant"])[0])
    assert amax == 1000.0

    pmod = dataclasses.replace(mod, quant="calibrate:p99")
    out_p, mut_p = pmod.apply(variables, x, mutable=["quant"])
    p99 = float(jax.tree_util.tree_leaves(mut_p["quant"])[0])
    assert p99 <= 1.0, p99          # the hot pixel is beyond the 99th pct
    assert p99 > 0.5, p99           # ...but the statistic is still a scale
    # both calibrate modes keep the production bf16 math byte-identical
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out_a))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out_p))
    # running max across batches applies to the percentile statistic too
    _, mut2 = pmod.apply({**variables, **mut_p}, x * 0.1, mutable=["quant"])
    assert float(jax.tree_util.tree_leaves(mut2["quant"])[0]) == p99

    # calibrate_backbone threads the percentile through to every backbone
    # conv: with a hot pixel in the calibration batch, the percentile
    # scales must sit strictly below the amax ones at the input conv
    from test_train import get_batch, small_ssd_cfg
    from x_detector_tpu.train.trainer import create_model_and_state
    cfg = small_ssd_cfg()
    _, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                      dtype=jnp.float32)
    tvars = {"params": state.params, "batch_stats": state.batch_stats}
    imgs = get_batch(cfg)["image"].at[0, 1, 1, :].set(1e4)
    qv_amax = quant.calibrate_backbone(cfg, tvars, [imgs],
                                       dtype=jnp.float32)
    qv_pct = quant.calibrate_backbone(cfg, tvars, [imgs],
                                      dtype=jnp.float32, percentile=99.0)
    top_a = max(float(v) for v in jax.tree_util.tree_leaves(qv_amax))
    top_p = max(float(v) for v in jax.tree_util.tree_leaves(qv_pct))
    assert top_p < top_a / 10, (top_p, top_a)


def test_int8_conv_tracks_bf16_within_quant_error():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 32),
                          jnp.float32)
    mod = ConvBN(32, (3, 3), dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(mod.apply(variables, x), np.float32)
    cmod = dataclasses.replace(mod, quant="calibrate")
    _, mut = cmod.apply(variables, x, mutable=["quant"])
    imod = dataclasses.replace(mod, quant="int8")
    got = np.asarray(imod.apply({**variables, **mut}, x), np.float32)
    # int8 per-channel weights + per-tensor activations: relative RMS error
    # well under 2% for a single conv
    rms = np.sqrt(((got - ref) ** 2).mean()) / max(
        np.sqrt((ref ** 2).mean()), 1e-9)
    assert rms < 0.02, rms


def test_tiny_backbone_int8_correlates_with_bf16():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3),
                          jnp.float32) * 100.0
    kw = dict(widths=(16, 32, 48, 64), units_per_stage=(1, 1, 1, 1),
              dtype=jnp.float32)
    bb = XceptionLite(**kw)
    variables = bb.init(jax.random.PRNGKey(0), x)
    ref = jax.jit(bb.apply)(variables, x)
    cbb = XceptionLite(quant="calibrate", **kw)
    _, mut = jax.jit(lambda v, xx: cbb.apply(v, xx, mutable=["quant"]))(
        variables, x)
    ibb = XceptionLite(quant="int8", **kw)
    got = jax.jit(ibb.apply)({**variables, **mut}, x)
    for k in ("c3", "c4", "c5"):
        a = np.asarray(ref[k], np.float32).ravel()
        b = np.asarray(got[k], np.float32).ravel()
        assert np.isfinite(b).all()
        cos = (a @ b) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9)
        # error accumulates across the depth; cosine similarity is the
        # right stability check for random (untrained) weights
        assert cos > 0.98, (k, cos)


@pytest.mark.slow
def test_full_ssd_pipeline_with_int8_backbone():
    from test_train import get_batch, small_ssd_cfg
    from x_detector_tpu.cli.evaluate import build_eval_fn
    from x_detector_tpu.train.trainer import create_model_and_state

    cfg = small_ssd_cfg()
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    images = get_batch(cfg)["image"]
    qv = quant.calibrate_backbone(cfg, variables, [images, images * 0.5],
                                  dtype=jnp.float32)
    assert all(float(v) > 0.0 for v in jax.tree_util.tree_leaves(qv))

    qcfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backbone_quant="int8"))
    qmodel = quant.build_detector(qcfg.model, dtype=jnp.float32)
    eval_fn = build_eval_fn(qmodel, qcfg)
    boxes, scores, classes, valid = eval_fn(dict(variables, quant=qv),
                                            images)
    assert np.isfinite(np.asarray(boxes)).all()
    assert np.isfinite(np.asarray(scores)).all()
    assert boxes.shape[0] == images.shape[0]


def test_full_lighthead_pipeline_with_int8_backbone():
    from test_train import get_batch, small_lighthead_cfg
    from x_detector_tpu.cli.evaluate import build_eval_fn
    from x_detector_tpu.train.trainer import create_model_and_state

    cfg = small_lighthead_cfg()
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    images = get_batch(cfg)["image"]
    qv = quant.calibrate_backbone(cfg, variables, [images],
                                  dtype=jnp.float32)

    qcfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backbone_quant="int8"))
    qmodel = quant.build_detector(qcfg.model, dtype=jnp.float32)
    eval_fn = build_eval_fn(qmodel, qcfg)
    boxes, scores, classes, valid = eval_fn(dict(variables, quant=qv),
                                            images)
    assert np.isfinite(np.asarray(boxes)).all()
    assert boxes.shape[0] == images.shape[0]


def test_act8_exact_dx_quantized_dk():
    # act8 (the train-step bandwidth probe): conv is bilinear, so dL/dx is
    # a function of (g, kernel) only and must be EXACT; dL/dkernel reads
    # the int8-saved activation and carries bounded quantization noise.
    from x_detector_tpu.models.layers import QuantConv

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 16),
                          jnp.float32)
    ref_mod = ConvBN(16, (3, 3), use_bn=False, relu=False,
                     dtype=jnp.float32)
    variables = ref_mod.init(jax.random.PRNGKey(0), x)
    a8_mod = dataclasses.replace(ref_mod, quant="act8")

    def loss(mod):
        def f(params, xx):
            y = mod.apply(params, xx)
            return (y * jnp.arange(y.size, dtype=y.dtype
                                   ).reshape(y.shape)).sum()
        return f

    (gref_p, gref_x) = jax.grad(loss(ref_mod), argnums=(0, 1))(variables, x)
    (ga8_p, ga8_x) = jax.grad(loss(a8_mod), argnums=(0, 1))(variables, x)
    np.testing.assert_allclose(np.asarray(ga8_x), np.asarray(gref_x),
                               rtol=1e-6, atol=1e-6)
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(gref_p)[0])
    flat_a8 = dict(jax.tree_util.tree_flatten_with_path(ga8_p)[0])
    for path, a in flat_ref.items():
        a = np.asarray(a, np.float64)
        b = np.asarray(flat_a8[path], np.float64)
        rms = np.sqrt(((a - b) ** 2).mean()) / max(
            np.sqrt((a ** 2).mean()), 1e-12)
        if "bias" in jax.tree_util.keystr(path):
            assert rms == 0.0, (path, rms)   # dL/dbias = sum(g): exact
        else:
            # kernel grad reads the int8 activation: noisy but close,
            # and NOT identical (proves the int8 path actually ran)
            assert 0.0 < rms < 0.02, (path, rms)


@pytest.mark.slow
def test_act8_train_step_runs():
    # the full SSD train step compiles and runs with backbone_quant="act8"
    # and produces finite losses (no "quant" collection is created)
    from test_train import get_batch, small_ssd_cfg
    from x_detector_tpu.train.trainer import (create_model_and_state,
                                              make_train_step)

    cfg = small_ssd_cfg()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, backbone_quant="act8"))
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32)
    assert state.batch_stats is not None
    step = jax.jit(make_train_step(model, cfg))
    batch = get_batch(cfg)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # params actually moved
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0.0


def test_prequantize_matches_in_graph_quantization():
    """quant.prequantize bakes int8 kernels + scales into the pytree with
    the same formula QuantConv applies in-graph; the two int8 paths must
    agree to within 1-ulp scale-rounding differences (separately compiled
    reductions can differ in the last fp32 bit, which can flip a value
    sitting exactly on a quantization-grid boundary — observed ~1e-7
    relative).  The container-export contract: stored-int8 weights change
    the artifact's HBM traffic, not its math."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3),
                          jnp.float32) * 100.0
    kw = dict(widths=(16, 32, 48, 64), units_per_stage=(1, 1, 1, 1),
              dtype=jnp.float32)
    bb = XceptionLite(**kw)
    variables = bb.init(jax.random.PRNGKey(0), x)
    cbb = XceptionLite(quant="calibrate", **kw)
    _, mut = jax.jit(lambda v, xx: cbb.apply(v, xx, mutable=["quant"]))(
        variables, x)

    ibb = XceptionLite(quant="int8", **kw)
    in_graph = jax.jit(ibb.apply)({**variables, **mut}, x)

    pre = quant.prequantize({**variables, **mut})
    kernels = [v for p, v in
               jax.tree_util.tree_flatten_with_path(pre["params"])[0]
               if "kernel" in jax.tree_util.keystr(p)]
    assert any(k.dtype == jnp.int8 for k in kernels)
    scales = [v for p, v in
              jax.tree_util.tree_flatten_with_path(pre["quant"])[0]
              if "w_scale" in jax.tree_util.keystr(p)]
    assert scales and all(s.ndim == 1 for s in scales)
    got = jax.jit(ibb.apply)(pre, x)
    for k in ("c3", "c4", "c5"):
        np.testing.assert_allclose(np.asarray(in_graph[k]),
                                   np.asarray(got[k]),
                                   rtol=1e-3, atol=1e-2, err_msg=k)


def test_prequantize_guards():
    """Double application and uncalibrated (zeros) collections both raise
    instead of silently corrupting weights (round-4 self-review)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3),
                          jnp.float32)
    kw = dict(widths=(16, 32, 48, 64), units_per_stage=(1, 1, 1, 1),
              dtype=jnp.float32)
    bb = XceptionLite(**kw)
    variables = bb.init(jax.random.PRNGKey(0), x)
    cbb = XceptionLite(quant="calibrate", **kw)
    _, mut = jax.jit(lambda v, xx: cbb.apply(v, xx, mutable=["quant"]))(
        variables, x)

    pre = quant.prequantize({**variables, **mut})
    with pytest.raises(ValueError, match="already int8"):
        quant.prequantize(pre)

    zeros = jax.tree_util.tree_map(jnp.zeros_like, mut["quant"])
    with pytest.raises(ValueError, match="uncalibrated"):
        quant.prequantize({**variables, "quant": zeros})

    # and the family dispatch validates like trainer's
    import dataclasses as dc
    from x_detector_tpu.config import ssd_resnet50
    bad = dc.replace(ssd_resnet50().model, family="sdd")
    with pytest.raises(ValueError, match="unknown family"):
        quant.build_detector(bad)
