"""BASELINE config-4 train-step benchmark + MFU accounting (one chip).

Measures the FULL training step — device-side synthetic batch + augmentation
+ forward + RPN/OHEM losses + backward + SGD-momentum update — exactly like
tools/train_synthetic_capstone.py runs it, with the axon-safe measurement
protocol (queue N steps over a state dependency chain, one scalar readback
fences the FIFO; jax.block_until_ready is a no-op over the tunnel).

Also reports XLA's own cost analysis for the compiled step (flops) and the
derived MFU against the v5e bf16 peak, so optimization work has a
speed-of-light reference.

Run WITHOUT setting PYTHONPATH (this script inserts its own sys.path;
``PYTHONPATH=.`` would clobber /root/.axon_site and kill the TPU backend):

  python tools/bench_train.py [--steps 30] [--profile DIR]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from x_detector_tpu.config import lighthead_xception
from x_detector_tpu.data.augment import preprocess_batch_for_train
from x_detector_tpu.data.synthetic import synthetic_batch_device
from x_detector_tpu.train.trainer import create_model_and_state, make_train_step

V5E_BF16_PEAK = 197e12  # FLOP/s per chip (public v5e spec)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--image-size", type=int, default=800)
    p.add_argument("--profile", default=None,
                   help="capture a jax.profiler trace of 3 steps to this dir")
    p.add_argument("--no-aug", action="store_true",
                   help="skip device augmentation (isolate the train step)")
    p.add_argument("--act8", action="store_true",
                   help="backbone_quant='act8': save conv-backward "
                        "activations as int8 (halves saved-activation HBM "
                        "bytes; exact dL/dx, quantized filter grad)")
    p.add_argument("--remat", type=int, default=0,
                   help="backbone_remat_stages override (recompute-for-"
                        "bandwidth A/B, DESIGN §17)")
    p.add_argument("--pregen", action="store_true",
                   help="pre-stage raw batches outside the timed loop "
                        "(config-4 contract: aug + train step; data "
                        "generation is the harness, not the step)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="grad_accum_steps: N sequential microbatches per "
                        "optimizer update (measures the accumulation "
                        "overhead vs the direct batch at equal global "
                        "batch; peak HBM line shows the memory win)")
    p.add_argument("--scan", action="store_true",
                   help="run all --steps inside ONE jitted lax.scan per "
                        "timed pass (3 passes, best reported) — the §13 "
                        "in-jit protocol bench.py adopted in round 5; the "
                        "default queue-N protocol embeds ~2 ms of tunnel "
                        "dispatch per step (round-5 finding: it does NOT "
                        "amortize).  Incompatible with --pregen/--profile.")
    args = p.parse_args()

    cfg = lighthead_xception(image_size=args.image_size)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, backbone_remat_stages=args.remat,
            backbone_quant="act8" if args.act8 else None),
        train=dataclasses.replace(cfg.train, batch_size=args.batch,
                                  warmup_steps=0,
                                  grad_accum_steps=args.grad_accum))
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.bfloat16)
    step_fn = make_train_step(model, cfg)
    canvas = int(args.image_size * 1.2)

    if args.no_aug:
        def body(state, key):
            kd, ks = jax.random.split(key)
            raw = synthetic_batch_device(kd, args.batch, args.image_size,
                                         cfg.data.max_gt_boxes)
            raw["image"] = raw["image"] - 115.0
            return step_fn(state, raw, ks)
    elif args.pregen:
        def body(state, raw, key):
            ka, ks = jax.random.split(key)
            batch = preprocess_batch_for_train(ka, raw, cfg.data)
            return step_fn(state, batch, ks)
    else:
        def body(state, key):
            kd, ka, ks = jax.random.split(key, 3)
            raw = synthetic_batch_device(kd, args.batch, canvas,
                                         cfg.data.max_gt_boxes)
            batch = preprocess_batch_for_train(ka, raw, cfg.data)
            return step_fn(state, batch, ks)

    key0 = jax.random.PRNGKey(7)
    if args.scan:
        if args.pregen or args.profile:
            p.error("--scan is incompatible with --pregen/--profile")

        @jax.jit
        def scan_pass(state, key):
            def one(carry, i):
                carry, m = body(carry, jax.random.fold_in(key, i))
                return carry, m["total_loss"]
            state, losses = jax.lax.scan(one, state, jnp.arange(args.steps))
            return state, losses

        lowered = scan_pass.lower(state, key0)
        compiled = lowered.compile()
        try:
            cost = compiled.cost_analysis()
            cost = cost[0] if isinstance(cost, list) else cost
            # XLA's cost model counts a scan body ONCE regardless of trip
            # count (verified: flops identical for length 2 vs 8), so the
            # reported total already approximates ONE step's flops.
            flops = float(cost.get("flops", float("nan")))
        except Exception as e:
            print(f"cost_analysis unavailable: {e}", file=sys.stderr)
            flops = float("nan")
        state, losses = scan_pass(state, jax.random.fold_in(key0, 0))
        _ = float(np.asarray(losses[-1]))       # warmup + fence
        times = []
        for rep in range(1, 4):
            t0 = time.perf_counter()
            state, losses = scan_pass(state, jax.random.fold_in(key0, rep))
            loss = float(np.asarray(losses[-1]))  # one readback per pass
            times.append(time.perf_counter() - t0)
        dt = min(times)                          # best-of-3 (bench.py §13)
        ms = dt / args.steps * 1e3
        img_s = args.batch * args.steps / dt
        mfu = flops / (dt / args.steps) / V5E_BF16_PEAK
        print(f"platform: {jax.devices()[0].platform}")
        print(f"train step [in-jit scan, best of 3 passes x {args.steps} "
              f"steps]: {ms:.1f} ms  ({img_s:.1f} img/s/chip, batch "
              f"{args.batch} @ {args.image_size}px, "
              f"aug={'off' if args.no_aug else 'on'})")
        print(f"pass times: {[round(t, 3) for t in sorted(times)]} s")
        print(f"XLA-estimated flops/step: {flops/1e12:.2f} TF  ->  MFU "
              f"{100*mfu:.1f}% of v5e bf16 peak  (loss {loss:.3f})")
        return
    if args.pregen:
        gen = jax.jit(lambda k: synthetic_batch_device(
            k, args.batch, canvas, cfg.data.max_gt_boxes))
        raws = [jax.tree_util.tree_map(jnp.asarray,
                                       gen(jax.random.PRNGKey(1000 + i)))
                for i in range(8)]
        inner = jax.jit(body, donate_argnums=(0,))
        counter = [0]

        def fused(state, key):  # rotate over distinct pre-staged batches
            raw = raws[counter[0] % len(raws)]
            counter[0] += 1
            return inner(state, raw, key)

        lowered = inner.lower(state, raws[0], key0)
    else:
        fused = jax.jit(body, donate_argnums=(0,))
        lowered = fused.lower(state, key0)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        flops = float(cost.get("flops", float("nan")))
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        flops = float("nan")
    try:
        mem = compiled.memory_analysis()
        print(f"peak HBM (argument+output+temp): "
              f"{(mem.argument_size_in_bytes + mem.output_size_in_bytes + mem.temp_size_in_bytes) / 2**30:.2f} GiB "
              f"(temp {mem.temp_size_in_bytes / 2**30:.2f} GiB)")
    except Exception:
        pass

    # warmup (2 steps) — also stages the donated state on device
    state, m = fused(state, jax.random.fold_in(key0, 0))
    state, m = fused(state, jax.random.fold_in(key0, 1))
    _ = float(np.asarray(m["total_loss"]))

    if args.profile:
        with jax.profiler.trace(args.profile):
            for i in range(2, 5):
                state, m = fused(state, jax.random.fold_in(key0, i))
            _ = float(np.asarray(m["total_loss"]))
        print(f"trace written to {args.profile}")

    t0 = time.perf_counter()
    for i in range(100, 100 + args.steps):
        state, m = fused(state, jax.random.fold_in(key0, i))
    loss = float(np.asarray(m["total_loss"]))  # FIFO fence
    dt = time.perf_counter() - t0

    ms = dt / args.steps * 1e3
    img_s = args.batch * args.steps / dt
    mfu = flops / (dt / args.steps) / V5E_BF16_PEAK
    print(f"platform: {jax.devices()[0].platform}")
    print(f"train step: {ms:.1f} ms  ({img_s:.1f} img/s/chip, batch "
          f"{args.batch} @ {args.image_size}px, aug={'off' if args.no_aug else 'on'})")
    print(f"XLA-estimated flops/step: {flops/1e12:.2f} TF  ->  MFU "
          f"{100*mfu:.1f}% of v5e bf16 peak  (loss {loss:.3f})")


if __name__ == "__main__":
    main()
