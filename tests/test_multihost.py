"""Multi-host data parallelism over DCN, simulated with 2 real processes.

BASELINE config 5's multi-host half (`jax.distributed.initialize` +
per-host batch assembly via ``make_array_from_process_local_data``) was
previously in place but unexercised (docs/ROADMAP.md): here two actual
processes, each owning 2 virtual CPU devices, form a 4-device cluster,
each feeds only its LOCAL batch shard, and the pmean'd loss must agree
across processes AND match a single-process 4-device run of the same
global batch.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_dp_children():
    here = os.path.dirname(os.path.abspath(__file__))
    child = os.path.join(here, "_multihost_child.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children pin their own device counts

    procs = [subprocess.Popen(
        [sys.executable, child, coord, "2", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs, errs, rcs = [], [], []
    for p in procs:
        out, err = p.communicate(timeout=900)
        outs.append(out)
        errs.append(err)
        rcs.append(p.returncode)
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_LOSS"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    return losses, outs, errs, rcs


def _is_barrier_timeout(err: str) -> bool:
    """The ONE forgivable child failure: a coordination-service deadline in
    the shutdown/barrier path (the two processes reach
    jax.distributed.shutdown() far apart on an overloaded 1-core host).
    Keyed on the signature, not on 'loss printed', so any other post-loss
    crash (e.g. a future checkpoint-write failure) still fails the test."""
    low = err.lower()
    return "deadline_exceeded" in low and ("barrier" in low or
                                           "shutdown" in low or
                                           "heartbeat" in low)


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    import warnings

    losses, outs, errs, rcs = _spawn_dp_children()
    if set(losses) != {0, 1} and any(
            "DEADLINE_EXCEEDED" in e for e in errs):
        # Known 1-core-CI flake: the Gloo/coordination KV handshake has a
        # hard 30 s deadline, and a loaded host can starve a child past it
        # during INIT (observed with pytest + a TPU host loop sharing the
        # core). That's a timeout before any math ran — retry once; a
        # genuine transport/math failure reproduces.
        warnings.warn("multihost DP: init-deadline flake, retrying the "
                      "two-process spawn once")
        losses, outs, errs, rcs = _spawn_dp_children()
    # The DP step itself must have succeeded on both processes (both loss
    # lines present)...
    assert set(losses) == {0, 1}, (outs, errs)
    # ...and a nonzero exit is forgiven ONLY for the known shutdown-barrier
    # raciness, identified by its stderr signature.
    for rc, err in zip(rcs, errs):
        if rc != 0:
            assert _is_barrier_timeout(err), (
                f"child exited rc={rc} without the shutdown-barrier "
                f"signature:\n{err[-2000:]}")
            warnings.warn(f"multihost DP: tolerated rc={rc} child with "
                          "shutdown-barrier timeout signature")
    # pmean makes the loss global: both hosts must report the same number
    assert abs(losses[0] - losses[1]) < 1e-6, losses

    # single-process reference: the DP loss is pmean of per-device losses
    # (test_parallel.test_dp_detector_loss_matches_shard_mean proves that),
    # so the sharp check here is mean-of-per-shard-jitted-losses on the
    # same global batch — no second shard_map compile needed.
    import dataclasses

    import jax
    import numpy as np
    import jax.numpy as jnp

    from test_train import small_ssd_cfg, get_batch
    from x_detector_tpu.train.trainer import (create_model_and_state,
                                              make_loss_fn)

    cfg = small_ssd_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=4))
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32)
    batch = get_batch(cfg)
    loss_fn = jax.jit(make_loss_fn(model, cfg))
    rng = jax.random.PRNGKey(1)
    shard_losses = []
    for i in range(4):
        shard = {k: v[i:i + 1] for k, v in batch.items()}
        l, _ = loss_fn(state.params, state.batch_stats, shard,
                       jax.random.fold_in(rng, i))
        shard_losses.append(float(l))
    ref = float(np.mean(shard_losses))
    # same math, different partitioning/transport: small fp-reassociation
    # slack for the hard-negative top-k (see test_parallel notes)
    rel = abs(ref - losses[0]) / max(abs(ref), 1e-6)
    print(f"MULTIHOST_REF {ref:.8f} child {losses[0]:.8f} rel {rel:.2e}")
    assert rel < 1e-3, (ref, losses)
