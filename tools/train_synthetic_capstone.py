"""Fully on-device training harness: synthetic gen + augmentation + train
step fused in one jit, fresh data every step; held-out eval on a disjoint
key stream.

Backs the README "held-out mAP 0.688 ± 0.011 (2 seeds) / 222 img/s" row
(round-3 runs, one v5e chip, 2026-08-17) and the DESIGN §18 2×2
sampler-vs-seed A/B: CAPSTONE_SAMPLER=r1 restores the round-1
area-uniform crop distribution, CAPSTONE_SEED varies init + data stream.
Measured mAP — r1 sampler: 0.6069 (seed 0) / 0.7031 (seed 1); oracle
sampler: 0.6989 / 0.6777. Same-arm seed spread (±0.05) exceeds both the
arm difference and round 2's "0.72 -> 0.69 regression" (seed noise).

Run WITHOUT setting PYTHONPATH (this script inserts its own sys.path;
``PYTHONPATH=.`` would clobber /root/.axon_site and kill the TPU backend):

  python tools/train_synthetic_capstone.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time, dataclasses, numpy as np, jax, jax.numpy as jnp
from x_detector_tpu.config import lighthead_xception
from x_detector_tpu.data.synthetic import synthetic_batch_device
from x_detector_tpu.data.augment import preprocess_batch_for_train, preprocess_for_eval
from x_detector_tpu.train.trainer import create_model_and_state, make_train_step
from x_detector_tpu.models.lighthead import lighthead_postprocess
from x_detector_tpu.utils.metrics_voc import VOCEvaluator

STEPS = int(__import__('os').environ.get('CAPSTONE_STEPS', 12000))
cfg = lighthead_xception(image_size=800)
# CAPSTONE_SAMPLER=r1 restores the round-1 area-uniform crop distribution
# (data/augment.py) for the sampler-vs-step mAP-delta attribution A/B.
cfg = dataclasses.replace(cfg, data=dataclasses.replace(
    cfg.data,
    crop_sampler=os.environ.get('CAPSTONE_SAMPLER', cfg.data.crop_sampler)))
cfg = dataclasses.replace(cfg, train=dataclasses.replace(
    cfg.train, batch_size=16,
    learning_rate=float(os.environ.get('CAPSTONE_LR', 2e-3)), warmup_steps=200,
    lr_boundaries=(int(STEPS * 2 / 3), int(STEPS * 7 / 8)),
    lr_decays=(1.0, 0.3, 0.1)))
# CAPSTONE_SEED varies init + train-data stream for error bars (DESIGN
# §18); the eval stream stays fixed so every run scores the same
# held-out set.
SEED = int(os.environ.get('CAPSTONE_SEED', 0))
model, state = create_model_and_state(cfg, jax.random.PRNGKey(SEED),
                                      dtype=jnp.bfloat16)
step_fn = make_train_step(model, cfg)

@jax.jit
def fused(state, key):
    kd, ka, ks = jax.random.split(key, 3)
    raw = synthetic_batch_device(kd, 16, 960, cfg.data.max_gt_boxes)
    batch = preprocess_batch_for_train(ka, raw, cfg.data)
    return step_fn(state, batch, ks)

key0 = jax.random.fold_in(jax.random.PRNGKey(7), SEED)
state, m = fused(state, jax.random.fold_in(key0, 0))
_ = float(np.asarray(m["total_loss"]))
t0 = time.perf_counter()
for i in range(1, STEPS):
    state, m = fused(state, jax.random.fold_in(key0, i))
    if i % 1000 == 0:
        print(f"step {i}: loss {float(np.asarray(m['total_loss'])):.3f} "
              f"rpn_loc {float(np.asarray(m['rpn_loc_loss'])):.3f} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
dt = time.perf_counter()-t0
print(f"trained {STEPS} steps in {dt:.0f}s ({(STEPS-1)*16/dt:.1f} img/s, fully on-device)")

# held-out eval: disjoint key stream, 160 fresh images
variables = {"params": state.params, "batch_stats": state.batch_stats}
@jax.jit
def eval_batch(key):
    raw = synthetic_batch_device(key, 16, 800, cfg.data.max_gt_boxes)
    img = jax.vmap(lambda im: preprocess_for_eval(im, cfg.data))(raw["image"])
    det = lighthead_postprocess(model.apply(variables, img, train=False), cfg.model)
    return raw, det
ev = VOCEvaluator(num_classes=20)
ekey = jax.random.PRNGKey(123456)
for bi in range(10):
    raw, det = eval_batch(jax.random.fold_in(ekey, bi))
    gtb, gtl, gtm = map(np.asarray, (raw["gt_boxes"], raw["gt_labels"], raw["gt_mask"]))
    boxes, scores, classes, valid = map(np.asarray, (det.boxes, det.scores, det.classes, det.valid))
    for i in range(16):
        ev.add_ground_truth(f"b{bi}i{i}", gtb[i][gtm[i]], gtl[i][gtm[i]])
        v = valid[i]
        ev.add_detections(f"b{bi}i{i}", boxes[i][v], scores[i][v], classes[i][v])
res = ev.evaluate()
print("held-out eval mAP (fresh data,", STEPS, "steps):", round(res["mAP"], 4))
print("per-class:", {k: round(v,2) for k,v in sorted(res["per_class_ap"].items())})
