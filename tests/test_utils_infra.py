"""Direct unit tests for the infra modules every other test only touches
indirectly: lr schedule/optimizer (reference T5), the JSONL metrics
logger (SURVEY §5 observability), DeviceTimer, and the inspect CLI (D3)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x_detector_tpu.config import TrainConfig
from x_detector_tpu.train.schedule import (make_optimizer,
                                           piecewise_with_warmup)
from x_detector_tpu.utils.logging import MetricsLogger
from x_detector_tpu.utils.profiling import DeviceTimer


# ---------------------------------------------------------------------------
# lr schedule (reference T1: piecewise-constant Momentum decay + warmup)
# ---------------------------------------------------------------------------

def test_piecewise_schedule_golden_values():
    s = piecewise_with_warmup(1e-3, boundaries=(100, 200),
                              decays=(1.0, 0.1, 0.01), warmup_steps=10)
    # linear warmup from 0.1x to 1x over 10 steps
    np.testing.assert_allclose(float(s(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(5)), 1e-4 + (1e-3 - 1e-4) * 0.5,
                               rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-6)
    # plateau at base lr until the first boundary
    np.testing.assert_allclose(float(s(99)), 1e-3, rtol=1e-6)
    # boundaries fire at the ABSOLUTE step (the offset regression: expressed
    # relative to warmup end, they'd fire warmup_steps late)
    np.testing.assert_allclose(float(s(100 + 1)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(199)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(200 + 1)), 1e-5, rtol=1e-6)
    np.testing.assert_allclose(float(s(10000)), 1e-5, rtol=1e-6)


def test_piecewise_schedule_no_warmup():
    s = piecewise_with_warmup(2e-3, boundaries=(50,), decays=(1.0, 0.5),
                              warmup_steps=0)
    np.testing.assert_allclose(float(s(0)), 2e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(51)), 1e-3, rtol=1e-6)


def test_boundaries_inside_warmup_rejected():
    with pytest.raises(AssertionError, match="exceed"):
        piecewise_with_warmup(1e-3, boundaries=(5,), decays=(1.0, 0.1),
                              warmup_steps=10)


def test_weight_decay_masks_non_kernels():
    """Decoupled weight decay hits conv/dense kernels only — biases and BN
    scale/bias are exempt (slim idiom the reference follows)."""
    cfg = TrainConfig(learning_rate=1.0, warmup_steps=0, momentum=0.0,
                      weight_decay=0.1, lr_boundaries=(10,),
                      lr_decays=(1.0, 1.0))
    tx = make_optimizer(cfg)
    params = {"conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
              "bn": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))}}
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, tx.init(params), params)
    # kernel gets -lr * wd * param = -0.1; everything else exactly 0
    np.testing.assert_allclose(np.asarray(updates["conv"]["kernel"]), -0.1,
                               rtol=1e-6)
    assert float(jnp.abs(updates["conv"]["bias"]).max()) == 0.0
    assert float(jnp.abs(updates["bn"]["scale"]).max()) == 0.0
    assert float(jnp.abs(updates["bn"]["bias"]).max()) == 0.0


# ---------------------------------------------------------------------------
# MetricsLogger
# ---------------------------------------------------------------------------

def test_metrics_logger_jsonl_roundtrip(tmp_path, capsys):
    path = str(tmp_path / "metrics.jsonl")
    lg = MetricsLogger(path, echo_every=2)
    lg.log(1, {"loss": jnp.asarray(2.5), "lr": 1e-3})
    lg.log(2, {"loss": jnp.asarray(2.0), "lr": 1e-3})
    lg.close()
    recs = [json.loads(line) for line in open(path)]
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[0]["loss"] == 2.5 and recs[1]["loss"] == 2.0
    assert all("wall_time_s" in r for r in recs)
    # echo cadence: only step 2 (multiple of echo_every) printed
    err = capsys.readouterr().err
    assert "[step 2]" in err and "[step 1]" not in err


def test_metrics_logger_appends(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(path, echo=False)
    lg.log(1, {"a": 1.0})
    lg.close()
    lg = MetricsLogger(path, echo=False)  # resume appends, not truncates
    lg.log(2, {"a": 2.0})
    lg.close()
    assert len(open(path).readlines()) == 2


# ---------------------------------------------------------------------------
# DeviceTimer
# ---------------------------------------------------------------------------

def test_device_timer_measures_jitted_fn():
    fn = jax.jit(lambda x: (x * 2, (x * 2).sum()))
    argsets = [(jnp.ones((64, 64)) * i,) for i in range(3)]
    t = DeviceTimer(fn, argsets, warmup=1)
    sec = t.measure(iters=5)
    assert 0 < sec < 10.0


# ---------------------------------------------------------------------------
# inspect CLI (D3)
# ---------------------------------------------------------------------------

def test_inspect_data_cli_synthetic(tmp_path, capsys):
    from x_detector_tpu.cli.inspect_data import main
    out = str(tmp_path / "inspect")
    main(["--preset", "ssd_resnet50", "--num-images", "2",
          "--output-dir", out, "--canvas", "64", "--batch-size", "2"])
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == 2
    from PIL import Image
    im = np.asarray(Image.open(os.path.join(out, pngs[0])))
    assert im.shape == (64, 64, 3)
    assert "gt boxes" in capsys.readouterr().out
