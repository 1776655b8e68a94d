"""Serving-artifact benchmark over an export batch set {1, 4, 8, 16}.

Round-trips a judged preset — ``--family lighthead`` = BASELINE config 3
(Xception, 800px), ``--family ssd`` = BASELINE config 2 (ResNet-50,
512px, the int8 ship target) — through ``jax.export`` (serialize ->
deserialize via x_detector_tpu.serving, no model code on the consumer
side) at each batch shape and measures, per shape:

  * reloaded-artifact throughput (queue-N-readback-1 protocol), against the
    live-jitted pipeline at the reference batch (the exported graph should
    compile to the same XLA program — any gap is serialization overhead);
  * single-call latency (dispatch -> host readback of the detections):
    the request-facing time-to-first-detection. Over the axon tunnel this
    includes one ~27 ms RTT, which a colocated server would not pay.

``--container`` additionally exports the round-4 shared-weights container
(weights stored once + one small graph per bucket, serving.save_container)
and benches the reloaded DetectorContainer per bucket, with the artifact
sizes both ways — so the 4x-weights saving and its (expected-zero) runtime
cost are both on the record.

``--quant int8`` benches the PTQ backbone variant (random-init weights
calibrated on random images: a THROUGHPUT measurement only; accuracy A/B
lives in tools/quant_ab.py).

Run WITHOUT setting PYTHONPATH (this script inserts its own sys.path):

  python tools/bench_serving.py [--batches 1,4,8,16] [--container]
      [--quant int8]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 12


def main():
    from x_detector_tpu import serving
    from x_detector_tpu.cli.evaluate import build_eval_fn
    from x_detector_tpu.config import lighthead_xception, ssd_resnet50
    from x_detector_tpu.quant import build_detector

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", default="1,4,8,16")
    p.add_argument("--family", default="lighthead",
                   choices=("lighthead", "ssd"),
                   help="lighthead = BASELINE config 3 (Xception, 800px); "
                        "ssd = BASELINE config 2 (ResNet-50, 512px — the "
                        "int8 ship target)")
    p.add_argument("--container", action="store_true",
                   help="also bench the shared-weights container path")
    p.add_argument("--quant", default="none", choices=("none", "int8"))
    p.add_argument("--smoke", action="store_true",
                   help="64px tiny-capacity config: validate the full "
                        "export/container path on CPU in minutes; the "
                        "numbers are NOT the judged surfaces")
    args = p.parse_args()
    batch_set = [int(b) for b in args.batches.split(",")]

    cfg = (lighthead_xception(image_size=800) if args.family == "lighthead"
           else ssd_resnet50(image_size=512))
    if args.smoke:
        global ITERS
        ITERS = 3
        from fast_nms_ab import smoke_shrink
        cfg = smoke_shrink(cfg, args.family)
    size = cfg.model.image_size
    model = build_detector(cfg.model, jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)

    if args.quant == "int8":
        import dataclasses

        from x_detector_tpu import quant as quant_lib
        calib = [jax.random.uniform(jax.random.PRNGKey(50 + i),
                                    (max(batch_set), size, size, 3),
                                    jnp.float32, maxval=255.0)
                 for i in range(2)]
        qv = quant_lib.calibrate_backbone(cfg, variables, calib)
        variables = dict(variables, quant=qv)
        mcfg = dataclasses.replace(cfg.model, backbone_quant="int8")
        model = build_detector(mcfg, jnp.bfloat16)
        cfg = dataclasses.replace(cfg, model=mcfg)
        print("int8 backbone (throughput-only: random weights/calib)",
              flush=True)

    eval_fn = build_eval_fn(model, cfg)          # (variables, images) -> det

    def serving_fn(images):
        return eval_fn(variables, images)

    from jax import export as jexport
    outdir = tempfile.mkdtemp()
    arts = {}
    baked_sizes = {}
    for b in batch_set:
        spec = jax.ShapeDtypeStruct((b, size, size, 3), jnp.float32)
        blob = jexport.export(jax.jit(serving_fn))(spec).serialize()
        path = os.path.join(outdir, f"det_b{b}.stablehlo")
        with open(path, "wb") as f:
            f.write(blob)
        arts[b] = serving.load(path)
        baked_sizes[b] = len(blob)
        print(f"exported batch {b}: {len(blob)/1e6:.1f} MB", flush=True)

    cont = None
    if args.container:
        cont_vars = variables
        if args.quant == "int8":
            # Match cli.export: the container passes weights as runtime
            # arguments, so in-graph quantization cannot constant-fold —
            # store real int8 kernels (quant.prequantize) like the CLI
            # does, or every call re-reads + re-quantizes fp32 kernels.
            from x_detector_tpu import quant as quant_lib
            cont_vars = quant_lib.prequantize(variables)
            print("prequantized container kernels to int8", flush=True)

        def serving_fn_v(v, images):
            return eval_fn(v, images)
        vspec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), cont_vars)
        graphs = {}
        for b in batch_set:
            spec = jax.ShapeDtypeStruct((b, size, size, 3), jnp.float32)
            graphs[b] = jexport.export(
                jax.jit(serving_fn_v))(vspec, spec).serialize()
        cdir = os.path.join(outdir, "container")
        serving.save_container(cdir, cont_vars, graphs,
                               meta={"image_size": size})
        cont = serving.load_container(cdir)
        wsize = os.path.getsize(os.path.join(cdir, "weights.msgpack"))
        gsize = sum(len(g) for g in graphs.values())
        print(json.dumps({
            "container_weights_mb": round(wsize / 1e6, 1),
            "container_graphs_mb": round(gsize / 1e6, 1),
            "baked_artifacts_mb": round(sum(baked_sizes.values()) / 1e6, 1),
        }), flush=True)

    def bench_throughput(call, b):
        batches = [jax.random.uniform(jax.random.PRNGKey(i),
                                      (b, size, size, 3), jnp.float32,
                                      maxval=255.0) for i in range(ITERS)]
        _ = np.asarray(call(batches[0])[1]).sum()
        _ = np.asarray(call(batches[1])[1]).sum()
        best = float("inf")
        for _pass in range(3):
            t0 = time.perf_counter()
            outs = [call(x) for x in batches]
            _ = np.asarray(outs[-1][1]).sum()   # FIFO fence
            best = min(best, time.perf_counter() - t0)
        return b * ITERS / best

    def bench_latency(call, b, reps=10):
        x = jax.random.uniform(jax.random.PRNGKey(0), (b, size, size, 3),
                               jnp.float32, maxval=255.0)
        _ = np.asarray(call(x)[1]).sum()        # warm
        best = float("inf")
        for _ in range(reps):                   # single in-flight call:
            t0 = time.perf_counter()            # dispatch -> detections on
            _ = np.asarray(call(x)[1]).sum()    # host (includes tunnel RTT)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    ref_b = max(batch_set)
    live = bench_throughput(jax.jit(serving_fn), ref_b)
    print(f"live jit @ batch {ref_b}: {live:.1f} img/s/chip")
    for b in batch_set:
        ips = bench_throughput(arts[b].call, b)
        lat = bench_latency(arts[b].call, b)
        row = {
            "batch": b, "images_per_sec_per_chip": round(ips, 2),
            "single_call_latency_ms": round(lat, 2),
            "vs_live": round(ips / live, 3) if b == ref_b else None,
        }
        if cont is not None:
            cips = bench_throughput(lambda x, _b=b: cont.detect(x), b)
            row["container_images_per_sec_per_chip"] = round(cips, 2)
            row["container_vs_baked"] = round(cips / ips, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
