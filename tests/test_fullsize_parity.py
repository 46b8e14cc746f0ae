"""Opt-in full-size megakernel parity gate (VERDICT r4 item 3).

The regular suite checks megakernel/scan trajectory parity at tiny
geometries in Pallas interpret mode (tests/test_sampler_kernel.py); this
gate runs the REAL flagship geometry (512ch x 15L, T=200, 640 frames) on
actual hardware via tools/parity_fullsize.py. It is opt-in because it
needs the chip and minutes of compile:

    DIFFROLL_RUN_FULLSIZE_PARITY=1 python -m pytest \
        tests/test_fullsize_parity.py -q

The tool runs in a SUBPROCESS so this file stays importable under the
suite's forced-CPU conftest. A committed chip run of the same tool lives
at results/parity_fullsize/ (see its README for the recorded numbers).
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.skipif(
    os.environ.get("DIFFROLL_RUN_FULLSIZE_PARITY") != "1",
    reason="needs the TPU and minutes of compile; "
           "set DIFFROLL_RUN_FULLSIZE_PARITY=1 to run",
)
def test_fullsize_megakernel_parity_on_chip(tmp_path):
    out = tmp_path / "parity.json"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the tool pick the hardware backend
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "parity_fullsize.py"),
         f"out={out}", "platform=" + env.get("DIFFROLL_PARITY_PLATFORM",
                                             "axon")],
        env=env, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(out.read_text())
    assert rec["pass"] and rec["megakernel_applies"]
    assert rec["rel_err"] < 0.05
