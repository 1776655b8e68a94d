"""Jitted train steps for both detector families.

Rebuilds the graph-building half of the reference train scripts (SURVEY.md
§3.1): forward -> on-the-fly target assignment -> losses -> SGD-momentum
update, as one compiled function per family.  Batches are dicts of
fixed-shape arrays:

  image      [B, S, S, 3]   float32, whitened
  gt_boxes   [B, G, 4]      normalized corners, zero-padded
  gt_labels  [B, G]         int32 class ids (0 on padding)
  gt_mask    [B, G]         bool
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from x_detector_tpu.config import ExperimentConfig
from x_detector_tpu.models.lighthead import LightHeadRCNN, build_rpn_anchors
from x_detector_tpu.models.ssd import SSDModel, build_ssd_anchors
from x_detector_tpu.ops import matching
from x_detector_tpu.train import losses as loss_lib
from x_detector_tpu.train.schedule import make_optimizer
from x_detector_tpu.train.train_state import TrainState

Batch = Dict[str, jnp.ndarray]


def _mean_metrics(metrics: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: v.mean() for k, v in metrics.items()}


def _train_gt_mask(batch: Batch, cfg: ExperimentConfig) -> jnp.ndarray:
    """gt validity mask for training targets.

    The reference lineage excludes *difficult* VOC objects from training
    targets (they stay in eval, where the VOC metric ignores them); readers
    emit a per-gt ``difficult`` flag, which is subtracted here unless
    ``cfg.data.include_difficult`` opts back in.
    """
    mask = batch["gt_mask"]
    if not cfg.data.include_difficult and "difficult" in batch:
        mask = mask & ~batch["difficult"]
    return mask


# ---------------------------------------------------------------------------
# SSD family
# ---------------------------------------------------------------------------

def make_ssd_loss_fn(model: SSDModel, cfg: ExperimentConfig):
    """loss_fn(params, batch_stats, batch, rng) -> (loss, (metrics, bs))."""
    anchors = jnp.asarray(build_ssd_anchors(cfg.model))
    tcfg = cfg.train

    def loss_fn(params, batch_stats, batch, rng):
        del rng  # SSD loss is deterministic given the batch
        (cls_logits, box_codes), new_state = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"])

        def match_one(gtb, gtl, gtm):
            return matching.match_anchors(
                anchors, gtb, gtl, gtm, pos_iou=tcfg.ssd_match_iou,
                neg_iou=tcfg.ssd_match_iou, force_match=True)

        m = jax.vmap(match_one)(batch["gt_boxes"], batch["gt_labels"],
                                _train_gt_mask(batch, cfg))
        per_image = jax.vmap(functools.partial(
            loss_lib.ssd_loss, neg_pos_ratio=tcfg.neg_pos_ratio))
        total, metrics = per_image(cls_logits, box_codes, m.labels,
                                   m.reg_targets, m.fg_mask)
        return total.mean(), (_mean_metrics(metrics),
                              new_state["batch_stats"])

    return loss_fn


# ---------------------------------------------------------------------------
# Light-Head R-CNN family
# ---------------------------------------------------------------------------

def make_lighthead_loss_fn(model: LightHeadRCNN, cfg: ExperimentConfig):
    """loss_fn(params, batch_stats, batch, rng) -> (loss, (metrics, bs))."""
    anchors = jnp.asarray(build_rpn_anchors(cfg.model))
    tcfg = cfg.train

    def loss_fn(params, batch_stats, batch, rng):
        out, new_state = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"])

        bsz = batch["image"].shape[0]
        rngs = jax.random.split(rng, bsz)
        gt_mask = _train_gt_mask(batch, cfg)

        # --- RPN targets + loss (SURVEY.md §3.1: match 0.7/0.3, 256 sample)
        def rpn_one(key, gtb, gtl, gtm, cls, loc):
            m = matching.match_anchors(anchors, gtb, gtl, gtm,
                                       pos_iou=tcfg.rpn_pos_iou,
                                       neg_iou=tcfg.rpn_neg_iou,
                                       force_match=True)
            return loss_lib.rpn_loss(key, cls, loc, m.fg_mask, m.bg_mask,
                                     m.reg_targets,
                                     batch_size=tcfg.rpn_batch_size,
                                     fg_fraction=tcfg.rpn_fg_fraction)

        rpn_total, rpn_metrics = jax.vmap(rpn_one)(
            rngs, batch["gt_boxes"], batch["gt_labels"], gt_mask,
            out["rpn_cls"], out["rpn_loc"])

        # --- ROI targets + OHEM loss over the (stop-grad) proposals.
        # Loss participation = fg ∪ bg: proposals in the IoU dead zone
        # [roi_bg_iou_hi, roi_fg_iou) — and below roi_bg_iou_lo — are
        # ignored, per the reference's Fast-R-CNN sampling band.
        props = jax.lax.stop_gradient(out["proposals"])
        pvalid = out["proposal_valid"]

        def roi_one(p, pv, gtb, gtl, gtm, cls, box):
            m = matching.match_proposals(p, pv, gtb, gtl, gtm,
                                         fg_iou=tcfg.roi_fg_iou,
                                         bg_iou_hi=tcfg.roi_bg_iou_hi,
                                         bg_iou_lo=tcfg.roi_bg_iou_lo)
            return loss_lib.roi_loss_ohem(cls, box, m.labels, m.reg_targets,
                                          m.fg_mask, m.fg_mask | m.bg_mask,
                                          ohem_topk=tcfg.ohem_topk)

        roi_total, roi_metrics = jax.vmap(roi_one)(
            props, pvalid, batch["gt_boxes"], batch["gt_labels"],
            gt_mask, out["roi_cls"], out["roi_box"])

        total = rpn_total.mean() + roi_total.mean()
        metrics = {**_mean_metrics(rpn_metrics), **_mean_metrics(roi_metrics)}
        return total, (metrics, new_state["batch_stats"])

    return loss_fn


# ---------------------------------------------------------------------------
# State construction
# ---------------------------------------------------------------------------

def create_model_and_state(cfg: ExperimentConfig, rng: jax.Array,
                           dtype=jnp.bfloat16):
    """Build the model + initialized TrainState for the configured family."""
    if cfg.model.family == "ssd":
        model = SSDModel(config=cfg.model, dtype=dtype)
    elif cfg.model.family == "lighthead":
        model = LightHeadRCNN(config=cfg.model, dtype=dtype)
    else:
        raise ValueError(f"unknown family {cfg.model.family!r}")
    dummy = jnp.zeros((1, cfg.model.image_size, cfg.model.image_size, 3))
    # jit the init: eager flax init dispatches every param op individually
    # (measured 26-32 s for a TINY test model on the 1-core CI host —
    # dominated the suite), while the jitted init is one XLA program that
    # also lands in the persistent compile cache across processes.
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, dummy, train=False)
    tx = make_optimizer(cfg.train)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}),
                              tx=tx, ema_decay=cfg.train.ema_decay)
    return model, state


def make_loss_fn(model, cfg: ExperimentConfig):
    """Family-dispatched loss_fn(params, batch_stats, batch, rng)."""
    if cfg.model.family == "ssd":
        return make_ssd_loss_fn(model, cfg)
    return make_lighthead_loss_fn(model, cfg)


def make_grad_fn(loss_fn, accum: int = 1):
    """(params, batch_stats, batch, rng) -> (grads, new_bs, metrics).

    ``accum > 1`` splits the batch's leading axis into ``accum`` sequential
    microbatches under ``lax.scan`` and averages grads, BN stats, and
    metrics — ONE optimizer update per call.  Semantics deliberately match
    ``accum``-way data parallelism with the same per-device batch
    (parallel/data_parallel.py): each microbatch's BN stats are computed
    from the STEP-INITIAL running stats and then averaged (= ``pmean``),
    not chained, and the per-microbatch rng is ``fold_in(rng, i)`` exactly
    like the DP body's ``fold_in(rng, axis_index)``.  Peak activation
    memory drops ~1/accum; tested equivalent to the DP step
    (tests/test_train.py).
    """
    base = jax.value_and_grad(loss_fn, has_aux=True)

    if accum <= 1:
        def grad_fn(params, batch_stats, batch, rng):
            (loss, (metrics, new_bs)), grads = base(params, batch_stats,
                                                    batch, rng)
            return grads, new_bs, dict(metrics, total_loss=loss)
        return grad_fn

    def grad_fn(params, batch_stats, batch, rng):
        bsz = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if bsz % accum:
            raise ValueError(f"batch size {bsz} not divisible by "
                             f"grad_accum_steps={accum}")
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((accum, bsz // accum) + x.shape[1:]), batch)
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(accum))

        def body(gsum, xs):
            mb, key = xs
            (loss, (metrics, new_bs)), grads = base(params, batch_stats,
                                                    mb, key)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            return gsum, (dict(metrics, total_loss=loss), new_bs)

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        gsum, (metrics, new_bss) = jax.lax.scan(body, zeros, (micro, keys))
        inv = 1.0 / accum
        grads = jax.tree_util.tree_map(lambda g: g * inv, gsum)
        new_bs = jax.tree_util.tree_map(lambda x: x.mean(axis=0), new_bss)
        metrics = {k: v.mean(axis=0) for k, v in metrics.items()}
        return grads, new_bs, metrics

    return grad_fn


def make_train_step(model, cfg: ExperimentConfig
                    ) -> Callable[[TrainState, Batch, jax.Array],
                                  Tuple[TrainState, Dict[str, Any]]]:
    """One factory for both families: value_and_grad over the dispatched
    loss fn (microbatched when cfg.train.grad_accum_steps > 1), gradient
    application, metrics dict."""
    grad_fn = make_grad_fn(make_loss_fn(model, cfg),
                           cfg.train.grad_accum_steps)

    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        grads, new_bs, metrics = grad_fn(state.params, state.batch_stats,
                                         batch, rng)
        state = state.apply_gradients(grads, new_bs)
        return state, metrics

    return train_step
