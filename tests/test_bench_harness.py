"""bench.py outage-hardening harness tests (round-4, VERDICT item 1).

The round-3 judged artifact came back rc=1 with a bare traceback because the
axon tunnel wedged and bench.py was a single-shot script.  These tests drive
the reworked parent/child harness through its failure modes using the
XDET_BENCH_SIMULATE hook — the simulated wedge sleeps BEFORE importing jax,
so every test here completes in seconds and never touches a backend.
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


# Blanking PALLAS_AXON_POOL_IPS makes the axon sitecustomize a no-op, which
# drops bare interpreter startup from ~2.6 s (it imports jax to register the
# PJRT plugin) to ~0.04 s — simulated children never touch jax, so the
# deadlines can be tight and the wedge-kill paths run in seconds.
def _run_bench(simulate, attempts=3, preflight_deadline=3.0,
               measure_deadline=3.0, timeout=120, confirm=True):
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        XDET_BENCH_SIMULATE=simulate,
        XDET_BENCH_ATTEMPTS=str(attempts),
        XDET_BENCH_PREFLIGHT_DEADLINE=str(preflight_deadline),
        XDET_BENCH_MEASURE_DEADLINE=str(measure_deadline),
    )
    if confirm:
        # double opt-in: without this, the parent refuses simulated payloads
        env["XDET_BENCH_SIMULATE_CONFIRM"] = "1"
    else:
        env.pop("XDET_BENCH_SIMULATE_CONFIRM", None)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, env=env, timeout=timeout)


def _last_json_line(stdout):
    lines = [ln for ln in stdout.splitlines() if ln.strip().startswith("{")]
    assert lines, f"no JSON line in stdout: {stdout!r}"
    return json.loads(lines[-1])


def test_happy_path_relays_child_metric_line():
    res = _run_bench("ok-preflight,ok-measure")
    assert res.returncode == 0, res.stderr
    payload = _last_json_line(res.stdout)
    assert payload["metric"] == "detection_images_per_sec_per_chip"
    assert payload["simulated"] is True
    # exactly one stdout line: the driver contract
    assert len(res.stdout.strip().splitlines()) == 1


def test_wedged_preflight_recovers_on_retry():
    # Attempt 1 hangs (simulated tunnel wedge); the parent must kill it at
    # the deadline and succeed on attempt 2 in a fresh process.
    res = _run_bench("wedge-preflight-1,ok-preflight,ok-measure")
    assert res.returncode == 0, res.stderr
    payload = _last_json_line(res.stdout)
    assert payload["metric"] == "detection_images_per_sec_per_chip"
    assert "preflight attempt 1 failed: deadline" in res.stderr


def test_wedged_measurement_recovers_on_retry():
    res = _run_bench("ok-preflight,wedge-measure-1,ok-measure")
    assert res.returncode == 0, res.stderr
    payload = _last_json_line(res.stdout)
    assert payload["metric"] == "detection_images_per_sec_per_chip"
    assert "measure attempt 1 failed: deadline" in res.stderr


def test_total_outage_yields_structured_json_not_traceback():
    # Every preflight attempt wedges: the artifact must still be ONE
    # parseable JSON line carrying the per-attempt evidence, with rc=1.
    res = _run_bench("wedge-preflight-1,wedge-preflight-2,wedge-preflight-3")
    assert res.returncode == 1
    payload = _last_json_line(res.stdout)
    assert payload["status"] == "tpu_unavailable"
    assert payload["value"] is None
    assert len(payload["attempts"]) == 3
    assert all(a["status"] == "deadline" for a in payload["attempts"])
    assert "Traceback" not in res.stdout


def test_measurement_outage_after_good_preflight():
    res = _run_bench(
        "ok-preflight,wedge-measure-1,wedge-measure-2,wedge-measure-3")
    assert res.returncode == 1
    payload = _last_json_line(res.stdout)
    assert payload["status"] == "tpu_unavailable"
    assert "preflight passed" in payload["detail"]
    modes = [a["mode"] for a in payload["attempts"]]
    assert modes == ["preflight", "measure", "measure", "measure"]


def test_leaked_simulate_var_cannot_produce_green_artifact():
    # A stray XDET_BENCH_SIMULATE=ok-... in the environment (without the
    # XDET_BENCH_SIMULATE_CONFIRM=1 double opt-in) must NOT yield a
    # green-looking measurement: the parent refuses the simulated payload
    # and the artifact reports tpu_unavailable with the rejection recorded.
    res = _run_bench("ok-preflight,ok-measure", confirm=False,
                     preflight_deadline=30.0)
    assert res.returncode == 1
    payload = _last_json_line(res.stdout)
    assert payload["status"] == "tpu_unavailable"
    assert payload["value"] is None
    assert any(a["status"] == "simulated_leak" for a in payload["attempts"])
    assert "rejected: simulated payload" in res.stderr


def test_child_crash_is_retried_and_recorded():
    # An rc!=0 child (prompt failure, e.g. UNAVAILABLE at backend init — the
    # exact round-3 artifact failure) must also trigger the retry path, and
    # the evidence must record it as "error", not "deadline".
    res = _run_bench("crash-measure-1,ok-preflight,ok-measure")
    assert res.returncode == 0, res.stderr
    payload = _last_json_line(res.stdout)
    assert payload["metric"] == "detection_images_per_sec_per_chip"
    assert "measure attempt 1 failed: error" in res.stderr
