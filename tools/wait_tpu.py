"""Wait for the TPU tunnel to come back.

The axon backend sits behind a tunnel that goes down for hours at a time
(CLAUDE.md). Failure modes observed: `Unable to initialize backend 'axon'`
(fast failure) and `jax.devices()` hanging forever (slow failure). Either
way the ONLY safe probe is a *subprocess* with a hard wall-clock timeout —
in-process jax initialization can hang the caller.

Usage:
    python tools/wait_tpu.py              # poll every 60 s until up, then exit 0
    python tools/wait_tpu.py --once       # single probe: exit 0 up / 1 down
    python tools/wait_tpu.py --timeout 45 # per-probe subprocess timeout (s)
    python tools/wait_tpu.py --max-wait 7200  # give up after N s (exit 1)

Also importable: `probe_tpu(timeout=45) -> bool`, used by bench.py's
preflight so a dead tunnel degrades to a parseable JSON line instead of a
hang past the driver timeout (the BENCH_r03 rc-124 failure).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

_PROBE = (
    "import jax; d = jax.devices(); "
    "assert d and d[0].platform != 'cpu', d; print(d[0])"
)


def probe_tpu(timeout: float = 45.0) -> bool:
    """One subprocess probe: True iff the axon backend initializes and
    lists a non-CPU device within `timeout` seconds."""
    env = dict(os.environ)
    # make sure the axon sitecustomize is importable even if the caller
    # stripped PYTHONPATH
    parts = [p for p in env.get("PYTHONPATH", "").split(":") if p]
    if "/root/.axon_site" not in parts and os.path.isdir("/root/.axon_site"):
        parts.append("/root/.axon_site")
    env["PYTHONPATH"] = ":".join(parts)
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE],
            env=env, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--once", action="store_true", help="single probe")
    ap.add_argument("--timeout", type=float, default=45.0,
                    help="per-probe subprocess timeout (s)")
    ap.add_argument("--interval", type=float, default=60.0,
                    help="seconds between probes")
    ap.add_argument("--max-wait", type=float, default=0.0,
                    help="give up after N seconds (0 = forever)")
    args = ap.parse_args()

    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        up = probe_tpu(args.timeout)
        waited = time.time() - t0
        print(f"[wait_tpu] probe {attempt}: {'UP' if up else 'down'} "
              f"(waited {waited:.0f}s)", flush=True)
        if up:
            return 0
        if args.once:
            return 1
        if args.max_wait and waited >= args.max_wait:
            print("[wait_tpu] giving up", flush=True)
            return 1
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
