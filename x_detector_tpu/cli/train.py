"""Training CLI — the rebuild of the reference's *_train.py scripts (T1/T2).

Single-chip by default; ``--num-devices N`` switches to the shard_map
data-parallel step over an N-device mesh (BASELINE config 5 on a slice;
works identically on the virtual CPU mesh).

Example:
  python -m x_detector_tpu.cli.train --preset lighthead_xception \
      --steps 1000 --model-dir /tmp/lh  [--data-dir /path/to/tfrecords]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from x_detector_tpu.cli import common
from x_detector_tpu.data.augment import preprocess_batch_for_train
from x_detector_tpu.parallel import mesh as mesh_lib
from x_detector_tpu.parallel.data_parallel import make_dp_train_step
from x_detector_tpu.train.checkpoint import CheckpointManager
from x_detector_tpu.train.trainer import (create_model_and_state,
                                          make_train_step)
from x_detector_tpu.utils.logging import MetricsLogger


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--num-devices", type=int, default=0,
                   help="data-parallel device count (0 = single device)")
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard event files (scalar summaries)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="run VOC mAP eval every N steps (0 = off)")
    p.add_argument("--eval-batches", type=int, default=20)
    p.add_argument("--pretrained", default=None,
                   help="ImageNet backbone init (reference T5 semantics): a "
                        "torchvision .pth/.pt state dict or a TF-slim "
                        "resnet_v1_50 checkpoint prefix; heads keep their "
                        "fresh init")
    args = p.parse_args(argv)

    cfg = common.resolve_config(args)
    mesh_lib.maybe_initialize_distributed()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.pretrained and cfg.model.backbone != "resnet50":
        raise SystemExit("--pretrained provides ResNet-50 ImageNet "
                         f"weights; preset backbone is "
                         f"{cfg.model.backbone!r}")

    model, state = create_model_and_state(cfg, jax.random.PRNGKey(args.seed),
                                          dtype=dtype)

    if args.pretrained:
        from x_detector_tpu.utils.pretrained import load_pretrained_backbone
        v = load_pretrained_backbone(
            {"params": state.params, "batch_stats": state.batch_stats},
            args.pretrained,
            stage_sizes=cfg.model.backbone_stages or (3, 4, 6, 3))
        state = state.replace(
            params=v["params"], batch_stats=v["batch_stats"],
            # re-seed the EMA shadow so it tracks the grafted weights,
            # not the discarded fresh init
            ema_params=(jax.tree_util.tree_map(jnp.array, v["params"])
                        if state.ema_params is not None else None))
        print(f"grafted pretrained backbone from {args.pretrained}")

    mesh = None
    if args.num_devices and args.num_devices > 1:
        mesh = mesh_lib.make_mesh(args.num_devices)
        step_fn = make_dp_train_step(model, cfg, mesh)
        state = mesh_lib.replicate_state(mesh, state)
    else:
        step_fn = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))

    os.makedirs(args.model_dir, exist_ok=True)
    ckpt = CheckpointManager(os.path.join(args.model_dir, "ckpt"),
                             keep=cfg.train.keep_checkpoints)
    logger = MetricsLogger(os.path.join(args.model_dir, "metrics.jsonl"),
                           echo_every=args.log_every,
                           tensorboard_dir=(os.path.join(args.model_dir, "tb")
                                            if args.tensorboard else None))

    start_position = 0
    if args.resume and ckpt.latest_step() is not None:
        state, data_state = ckpt.restore(state)
        start_position = int(data_state.get("position", 0))
        print(f"resumed from step {int(state.step)} "
              f"(data position {start_position})")

    # Host canvas is larger than the train crop so crops have context.
    canvas = int(cfg.model.image_size * 1.2)
    # Deterministic resume: every data source (native loader, tf.data,
    # synthetic) continues its exact stream from the checkpointed position.
    it = common.batch_iterator(args, cfg, training=True, canvas_size=canvas,
                               start_batch=start_position)

    aug_rng = jax.random.PRNGKey(args.seed + 1)
    position = start_position

    # Host-side prefetch: load/generate the next batch while the device
    # steps (the device dispatch is async; the host loader was the
    # bottleneck otherwise).
    import concurrent.futures
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)

    def fetch():
        raw = next(it)
        return {k: jnp.asarray(v) for k, v in raw.items()
                if k in ("image", "gt_boxes", "gt_labels", "gt_mask",
                         "difficult", "box_scale")}

    pending = pool.submit(fetch)
    eval_fn = None
    step = int(state.step)
    while step < args.steps:
        raw = pending.result()
        pending = pool.submit(fetch)
        position += 1
        aug_key = jax.random.fold_in(aug_rng, position)
        batch = preprocess_batch_for_train(aug_key, raw, cfg.data)
        if mesh is not None:
            batch = mesh_lib.shard_batch(mesh, batch)
        step_key = jax.random.fold_in(jax.random.PRNGKey(args.seed + 2),
                                      position)
        state, metrics = step_fn(state, batch, step_key)
        step += 1  # tracked host-side; reading state.step would force a sync
        # Materializing metrics forces a device sync — only do it when a
        # record is actually written.
        if step % args.log_every == 0 or step >= args.steps:
            logger.log(step, metrics)
        if args.eval_every and step % args.eval_every == 0:
            from x_detector_tpu.cli.evaluate import build_eval_fn, run_eval
            if eval_fn is None:  # build (and jit) once, reuse across evals
                eval_fn = build_eval_fn(model, cfg)
            # Periodic eval prefers the EMA shadow when one is maintained
            # (reference T5 semantics: the averaged weights are evaluated).
            variables = common.eval_variables(state)
            eval_it = common.batch_iterator(args, cfg, training=False)
            res = run_eval(model, variables, cfg, eval_it,
                           args.eval_batches, eval_fn=eval_fn)
            logger.log(step, {"eval_mAP": res["mAP"]})
        if step % args.checkpoint_every == 0 or step >= args.steps:
            ckpt.save(step, state, data_state={"position": position})
    pool.shutdown(wait=False, cancel_futures=True)
    ckpt.wait()
    ckpt.close()
    logger.close()
    print(f"done: {int(state.step)} steps -> {args.model_dir}")


if __name__ == "__main__":
    main()
