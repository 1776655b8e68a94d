"""Export a trained detector as a serialized StableHLO artifact (serving).

The reference has no serving story (SURVEY.md §1: "no serving stack"); for
production deployment this CLI freezes the full images -> (boxes, scores,
classes, valid) pipeline — weights baked in, NMS included — into a
``jax.export`` artifact that any JAX process (or an XLA runtime consuming
StableHLO) can reload and run without the model code.

  python -m x_detector_tpu.cli.export --preset lighthead_xception \
      --model-dir /tmp/lh --output /tmp/lh_detector.stablehlo --batch 8

Reload:
  from jax import export
  fn = export.deserialize(open(path, 'rb').read())
  boxes, scores, classes, valid = fn.call(images)   # [B, S, S, 3] float32

Input convention: with ``--raw-rgb`` the artifact takes raw [0, 255] RGB at
the model input size (preprocessing is baked in — recommended for serving);
without it, inputs must already be eval-preprocessed (resized + VGG-mean
whitened), matching what `build_eval_fn` consumes.  For letterbox configs
(lighthead presets) the raw-RGB artifact takes a second ``box_scale``
[B, 2] input (= [fy, fx] content fraction after client-side letterboxing)
and returns boxes already unscaled to original-image normalized coords.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from x_detector_tpu.cli import common
from x_detector_tpu.cli.evaluate import build_eval_fn
from x_detector_tpu.data.augment import preprocess_for_eval
from x_detector_tpu.train.checkpoint import CheckpointManager
from x_detector_tpu.train.trainer import create_model_and_state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--output", required=True, help="artifact path")
    p.add_argument("--batch", type=int, default=1,
                   help="static serving batch size")
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--raw-rgb", action="store_true",
                   help="bake eval preprocessing (resize+whiten) in, taking "
                        "raw [0,255] RGB of the model input size")
    p.add_argument("--quant", default="none", choices=("none", "int8"),
                   help="int8: post-training-quantized backbone "
                        "(x_detector_tpu/quant.py) — per-channel int8 "
                        "weights (constant-folded into single artifacts; "
                        "pre-quantized into the stored pytree for "
                        "--container, whose graphs take weights as a "
                        "runtime argument), calibrated static activation "
                        "scales; heads/NMS stay bf16/fp32")
    p.add_argument("--calib-batches", type=int, default=8,
                   help="calibration batches for --quant int8; with "
                        "--data-dir they come from the real eval TFRecords "
                        "(the distribution the model will serve), otherwise "
                        "synthetic eval-preprocessed images")
    p.add_argument("--calib-batch-size", type=int, default=None,
                   help="batch size of each calibration batch (default: "
                        "--batch). Activation amax barely varies with batch "
                        "size, but making the knob explicit keeps the "
                        "calibration sample count = batches x batch-size "
                        "unambiguous")
    p.add_argument("--calib-percentile", type=float, default=100.0,
                   help="activation-scale statistic for --quant int8: 100 "
                        "(default) = running abs-max; e.g. 99.9 = running "
                        "max of per-batch 99.9th-percentile |x| — the "
                        "outlier-robust choice for heavy-tailed real images "
                        "(tools/calib_sensitivity.py measures the tradeoff)")
    p.add_argument("--container", action="store_true",
                   help="write a shared-weights batch-set container to "
                        "--output (a directory): weights stored ONCE + one "
                        "small graph per --batches bucket, reloadable via "
                        "serving.load_container")
    p.add_argument("--batches", default="1,4,8,16",
                   help="bucket batch sizes for --container")
    p.add_argument("--bake-batches", default=None,
                   help="container buckets whose graphs embed the weights "
                        "as constants instead of sharing weights.msgpack "
                        "(DESIGN §16: runtime-arg weights cost 0.60x at "
                        "batch 1, parity at batch >= 4 — default bakes "
                        "bucket 1 when present; '' bakes none; an explicit "
                        "bucket missing from --batches is an error)")
    args = p.parse_args(argv)

    # Bucket list for --container.  Named bucket_batches (NOT `batches`):
    # round 4 shipped with this very name shadowed by the int8 calibration
    # generator below, silently writing zero-graph containers.
    bucket_batches = [int(b) for b in args.batches.split(",")]
    if args.bake_batches is not None and not args.container:
        # --bake-batches only means something for --container; silently
        # ignoring it would be exactly the no-silent-config-fallback
        # violation the flag's own validation exists to prevent.
        p.error("--bake-batches requires --container")
    if args.bake_batches is None:
        bake = {1} & set(bucket_batches)  # measured default: bake batch 1
    else:
        bake = {int(b) for b in args.bake_batches.split(",") if b.strip()}
        missing = bake - set(bucket_batches)
        if missing:
            # A silently dropped bake request would misreport batch-1
            # latency exactly the way a silent fast-NMS fallback would.
            p.error(f"--bake-batches {sorted(missing)} not in "
                    f"--batches {bucket_batches}")

    cfg = common.resolve_config(args)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(args.seed),
                                          dtype=dtype)
    ckpt = CheckpointManager(f"{args.model_dir}/ckpt")
    if ckpt.latest_step() is not None:
        state, _ = ckpt.restore(state)
        print(f"exporting checkpoint at step {int(state.step)}")
    else:
        print("WARNING: no checkpoint found, exporting random init")
    ckpt.close()
    variables = common.eval_variables(state, args.use_ema)
    if variables["params"] is state.ema_params:
        print("exporting EMA shadow weights")

    size = cfg.model.image_size
    if args.quant == "int8":
        import dataclasses

        from x_detector_tpu import quant as quant_lib
        calib_bs = args.calib_batch_size or args.batch
        pre = jax.jit(jax.vmap(lambda im: preprocess_for_eval(im, cfg.data)))
        if args.data_dir:
            # Calibrate on the REAL serving distribution: a model quantized
            # against synthetic ranges but deployed on natural images is the
            # classic PTQ failure mode (VERDICT r4 item 3).
            calib_cfg = dataclasses.replace(cfg, train=dataclasses.replace(
                cfg.train, batch_size=calib_bs))
            it = common.batch_iterator(args, calib_cfg, training=False)

            def real_calib_batches():
                for i in range(args.calib_batches):
                    try:
                        raw = next(it)
                    except StopIteration:
                        if i == 0:
                            raise ValueError(
                                f"no calibration data in {args.data_dir}")
                        return
                    yield pre(jnp.asarray(raw["image"], jnp.float32))
            calib_images = real_calib_batches()
            calib_src = (f"{args.calib_batches} real batches (batch "
                         f"{calib_bs}) from {args.data_dir}")
        else:
            from x_detector_tpu.data.synthetic import synthetic_batch_device
            gen = jax.jit(lambda k: synthetic_batch_device(
                k, calib_bs, size, cfg.data.max_gt_boxes)["image"])
            calib_images = (pre(gen(jax.random.PRNGKey(10_000 + i)))
                            for i in range(args.calib_batches))
            calib_src = (f"{args.calib_batches} synthetic batches (batch "
                         f"{calib_bs})")
        qv = quant_lib.calibrate_backbone(cfg, variables, calib_images,
                                          dtype=dtype,
                                          percentile=args.calib_percentile)
        variables = dict(variables, quant=qv)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, backbone_quant="int8"))
        model = quant_lib.build_detector(cfg.model, dtype)
        stat = ("amax" if args.calib_percentile >= 100.0
                else f"p{args.calib_percentile}")
        print(f"calibrated int8 backbone ({stat}) on {calib_src}")
        if args.container:
            # Container graphs take the weights as a runtime argument, so
            # in-graph quantization cannot constant-fold; store REAL int8
            # kernels (+ scales) so the artifact reads int8 from HBM
            # (bit-identical outputs — quant.prequantize).
            variables = quant_lib.prequantize(variables)
            print("prequantized backbone kernels to int8 for the container")

    eval_fn = build_eval_fn(model, cfg)
    from jax import export as jexport

    def export_one(batch: int, weights_as_arg: bool):
        """Serialize one bucket.  ``weights_as_arg=True`` (container mode)
        makes the graph take the variables pytree as its first argument so
        the weights are stored ONCE per container, not once per bucket."""
        spec = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32)
        if args.raw_rgb and cfg.data.letterbox:
            # Letterbox-trained model: the client letterboxes the raw image
            # onto the square canvas (uniform scale, top-left placement) and
            # passes box_scale=[fy, fx] (content fraction per image); the
            # artifact whitens, detects, and unscales boxes back to
            # original-image normalized coordinates — the geometry cannot
            # silently drift.
            def serving_fn(v, images, box_scale):
                whitened = jax.vmap(
                    lambda im: preprocess_for_eval(im, cfg.data))(images)
                boxes, scores, classes, valid = eval_fn(v, whitened)
                s = box_scale[:, None, [0, 1, 0, 1]]        # [B, 1, 4]
                boxes = jnp.clip(boxes / jnp.maximum(s, 1e-6), 0.0, 1.0)
                return boxes, scores, classes, valid
            extra = (jax.ShapeDtypeStruct((batch, 2), jnp.float32),)
            input_desc = (f"inputs letterboxed [{batch}, {size}, {size}, 3] "
                          f"float32 + box_scale [{batch}, 2]")
        elif args.raw_rgb:
            def serving_fn(v, images):
                whitened = jax.vmap(
                    lambda im: preprocess_for_eval(im, cfg.data))(images)
                return eval_fn(v, whitened)
            extra = ()
            input_desc = f"input [{batch}, {size}, {size}, 3] float32"
        else:
            def serving_fn(v, images):
                return eval_fn(v, images)
            extra = ()
            input_desc = (f"input [{batch}, {size}, {size}, 3] float32 "
                          "(pre-whitened)")
        if weights_as_arg:
            vspec = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
            exported = jexport.export(jax.jit(serving_fn))(vspec, spec,
                                                           *extra)
            input_desc = "weights pytree + " + input_desc
        else:
            fn = lambda *inputs: serving_fn(variables, *inputs)
            exported = jexport.export(jax.jit(fn))(spec, *extra)
        return exported.serialize(), input_desc

    if args.container:
        from x_detector_tpu import serving
        graphs, descs = {}, []
        for b in bucket_batches:
            # Baked buckets embed the weights (big graph, full batch-1
            # speed); the rest take them as a runtime argument and share
            # weights.msgpack (DESIGN §16 measured split).
            graphs[b], d = export_one(b, weights_as_arg=b not in bake)
            descs.append(d + (" [baked]" if b in bake else ""))
        desc = "; ".join(descs)
        # Belt and braces with save_container's own empty-graphs guard:
        # a container missing any requested bucket must never be written
        # (round 4's final commit wrote a 0-graph container exactly here).
        assert sorted(graphs) == sorted(bucket_batches), \
            f"exported buckets {sorted(graphs)} != requested {bucket_batches}"
        serving.save_container(
            args.output, variables, graphs, baked=bake,
            meta={"preset": cfg.model.name, "image_size": size,
                  "letterbox": bool(args.raw_rgb and cfg.data.letterbox),
                  "raw_rgb": bool(args.raw_rgb), "quant": args.quant})
        import numpy as _np
        wsize = sum(_np.asarray(a).nbytes
                    for a in jax.tree_util.tree_leaves(variables))
        gsize = sum(len(g) for g in graphs.values())
        print(f"wrote container -> {args.output}: weights "
              f"{wsize / 1e6:.1f} MB (stored once) + {len(graphs)} graphs "
              f"totalling {gsize / 1e6:.1f} MB ({desc}; reload via "
              "serving.load_container)")
    else:
        blob, input_desc = export_one(args.batch, weights_as_arg=False)
        with open(args.output, "wb") as f:
            f.write(blob)
        print(f"wrote {len(blob) / 1e6:.1f} MB -> {args.output} "
              f"({input_desc}; outputs boxes/scores/classes/valid)")


if __name__ == "__main__":
    main()
