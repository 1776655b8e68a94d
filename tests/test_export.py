"""jax.export serving artifact: serialize -> reload -> functional parity."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_lighthead import tiny_config
from x_detector_tpu.models.lighthead import (LightHeadRCNN,
                                             lighthead_postprocess)


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    from jax import export as jexport

    cfg = tiny_config("xception_lite")
    model = LightHeadRCNN(config=cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.2
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def serving_fn(images):
        det = lighthead_postprocess(
            model.apply(variables, images, train=False), cfg)
        return det.boxes, det.scores, det.classes, det.valid

    spec = jax.ShapeDtypeStruct((2, 64, 64, 3), jnp.float32)
    exported = jexport.export(jax.jit(serving_fn))(spec)
    blob = exported.serialize()
    path = tmp_path / "det.stablehlo"
    path.write_bytes(blob)

    # reload from bytes only and run
    fn = jexport.deserialize(path.read_bytes())
    rb, rs, rc, rv = map(np.asarray, fn.call(x))
    lb, ls, lc, lv = map(np.asarray, serving_fn(x))
    np.testing.assert_allclose(rs, ls, atol=1e-5)
    assert (rc == lc).all() and (rv == lv).all()
    np.testing.assert_allclose(rb, lb, atol=1e-3)


def test_serving_letterbox_matches_reader_geometry():
    """serving.letterbox_batch must reproduce the data pipeline's placement
    (uniform scale, top-left, half-up rounding) and box_scale convention."""
    from x_detector_tpu import serving

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (30, 60, 3), np.uint8)   # wide image
    canvas, scale = serving.letterbox_image(img, 64)
    assert canvas.shape == (64, 64, 3)
    # w0=60 -> w1=64, h0=30 -> h1=round(30*64/60)=32
    np.testing.assert_allclose(scale, [32 / 64, 64 / 64])
    assert (canvas[32:] == 0).all() and canvas[:32, :64].any()

    tall = rng.integers(0, 255, (50, 20, 3), np.uint8)
    batch, scales = serving.letterbox_batch([img, tall], 64)
    assert batch.shape == (2, 64, 64, 3) and scales.shape == (2, 2)
    np.testing.assert_allclose(scales[1], [64 / 64, round(20 * 64 / 50) / 64])


def test_serving_bucket_picker_and_padding():
    """pick_bucket routes a burst to the smallest fitting artifact batch;
    bucketed_letterbox_batch zero-pads to that batch."""
    from x_detector_tpu import serving

    assert serving.pick_bucket(1, [1, 4, 8, 16]) == 1
    assert serving.pick_bucket(3, [1, 4, 8, 16]) == 4
    assert serving.pick_bucket(4, [1, 4, 8, 16]) == 4
    assert serving.pick_bucket(9, [1, 4, 8, 16]) == 16
    assert serving.pick_bucket(40, [1, 4, 8, 16]) == 16  # caller splits

    imgs = [np.full((32, 48, 3), 128, np.uint8) for _ in range(3)]
    canvas, scale, n = serving.bucketed_letterbox_batch(imgs, 64,
                                                        [1, 4, 8])
    assert canvas.shape == (4, 64, 64, 3) and scale.shape == (4, 2)
    assert n == 3
    assert (canvas[3] == 0).all() and (scale[3] == 1.0).all()
    assert canvas[0].max() > 0
    import pytest
    with pytest.raises(ValueError):
        serving.bucketed_letterbox_batch(imgs * 4, 64, [1, 4, 8])


@pytest.mark.slow
def test_export_roundtrip_int8_backbone(tmp_path):
    """--quant int8 export path: the quantized pipeline serializes, reloads
    without model code, and matches the live int8 model bit-for-bit (the
    weight round/clip/cast is constant-folded into the artifact)."""
    import dataclasses

    from jax import export as jexport

    from test_train import get_batch, small_ssd_cfg
    from x_detector_tpu import quant
    from x_detector_tpu.cli.evaluate import build_eval_fn
    from x_detector_tpu.train.trainer import create_model_and_state

    cfg = small_ssd_cfg()
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
    qvars = dict(variables, quant=qv)

    def serving_fn(imgs):
        return eval_fn(qvars, imgs)

    spec = jax.ShapeDtypeStruct(images.shape, jnp.float32)
    blob = jexport.export(jax.jit(serving_fn))(spec).serialize()
    fn = jexport.deserialize(blob)
    rb, rs, rc, rv = map(np.asarray, fn.call(images))
    lb, ls, lc, lv = map(np.asarray, serving_fn(images))
    np.testing.assert_allclose(rs, ls, atol=1e-5)
    assert (rc == lc).all() and (rv == lv).all()
    np.testing.assert_allclose(rb, lb, atol=1e-3)


@pytest.mark.slow
def test_shared_weights_container_roundtrip(tmp_path):
    """Round-4 serving refinement (DESIGN §16 note): the batch set stores
    weights ONCE + one small graph per bucket; reload parity + size law."""
    from jax import export as jexport

    from test_train import get_batch, small_ssd_cfg
    from x_detector_tpu import serving
    from x_detector_tpu.cli.evaluate import build_eval_fn
    from x_detector_tpu.train.trainer import create_model_and_state

    cfg = small_ssd_cfg()
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_fn = build_eval_fn(model, cfg)
    size = cfg.model.image_size
    vspec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)

    # Hybrid split (DESIGN §16): bucket 1 baked (weights embedded — full
    # batch-1 speed), bucket 2 shared (weights as runtime argument).
    spec1 = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
    spec2 = jax.ShapeDtypeStruct((2, size, size, 3), jnp.float32)
    graphs = {
        1: jexport.export(
            jax.jit(lambda x: eval_fn(variables, x)))(spec1).serialize(),
        2: jexport.export(
            jax.jit(lambda v, x: eval_fn(v, x)))(vspec, spec2).serialize(),
    }
    d = str(tmp_path / "container")
    serving.save_container(d, variables, graphs, baked={1},
                           meta={"image_size": size, "raw_rgb": False})

    cont = serving.load_container(d)
    assert cont.buckets == [1, 2]
    assert cont.baked == {1}
    images = np.asarray(get_batch(cfg)["image"], np.float32)
    rb, rs, rc, rv = map(np.asarray, cont.detect(images))
    lb, ls, lc, lv = map(np.asarray, eval_fn(variables, images))
    np.testing.assert_allclose(rs, ls, atol=1e-5)
    assert (rc == lc).all() and (rv == lv).all()
    np.testing.assert_allclose(rb, lb, atol=1e-3)
    # batch-1 bucket also routes
    b1 = map(np.asarray, cont.detect(images[:1]))
    np.testing.assert_allclose(next(iter(b1)), lb[:1], atol=1e-3)
    with pytest.raises(ValueError, match="no graph for batch"):
        cont.detect(np.zeros((3, size, size, 3), np.float32))

    # Legacy containers (written before the hybrid-bake option) have no
    # "baked" key in meta.json: they must reload with every bucket shared.
    meta_path = os.path.join(d, "meta.json")
    with open(meta_path) as f:
        legacy_meta = json.load(f)
    legacy_meta.pop("baked")
    with open(meta_path, "w") as f:
        json.dump(legacy_meta, f)
    legacy = serving.load_container(d)
    assert legacy.baked == set()
    lb2 = np.asarray(legacy.detect(images)[0])   # bucket 2 is shared
    np.testing.assert_allclose(lb2, lb, atol=1e-3)
    with open(meta_path, "w") as f:              # restore for checks below
        json.dump(dict(legacy_meta, baked=[1]), f)

    # Size law: a weights-as-arg graph strictly beats the baked artifact of
    # the same bucket (which embeds the weights as constants), and the
    # container stores the weights exactly once.
    spec2 = jax.ShapeDtypeStruct((2, size, size, 3), jnp.float32)
    baked = jexport.export(
        jax.jit(lambda x: eval_fn(variables, x)))(spec2).serialize()
    assert len(graphs[2]) < len(baked)
    wbytes = os.path.getsize(os.path.join(d, "weights.msgpack"))
    nparams = sum(np.asarray(a).nbytes
                  for a in jax.tree_util.tree_leaves(variables))
    assert wbytes < nparams * 1.2 + 1e5     # once, with msgpack overhead
