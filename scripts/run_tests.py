#!/usr/bin/env python
"""THE one-command test runner: `python scripts/run_tests.py`.

Runs each test file in its own pytest subprocess and aggregates results.

Why not plain `pytest tests/`? A single-process run of the full suite
SIGABRTs inside an XLA CPU compile around test #86 on this sandbox's
8-device forced-host CPU mesh (reproduced repeatedly in round 3 — either
an XLA bug or program-cache accumulation; every file passes in isolation).
Per-file subprocesses bound the per-process program cache and make the
whole suite reliable in one command (VERDICT r3 weak #7 / next #9).
pytest-forked/xdist are not installed in this image, hence the hand-rolled
runner. Pass-through args go to every pytest invocation (e.g. -q, -k expr).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tests_dir = os.path.join(repo, "tests")
    files = sorted(f for f in os.listdir(tests_dir)
                   if f.startswith("test_") and f.endswith(".py"))
    extra = sys.argv[1:]

    env = dict(os.environ)
    # same platform forcing as tests/conftest.py, but set BEFORE python
    # starts so sitecustomize cannot grab the axon TPU backend first
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    t0 = time.time()
    failed = []
    total = 0
    for i, f in enumerate(files):
        t1 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", os.path.join("tests", f),
             "-q", "--no-header", *extra],
            cwd=repo, env=env, capture_output=True, text=True)
        out = proc.stdout.strip().splitlines()
        tail = out[-1] if out else "(no output)"
        status = "ok" if proc.returncode == 0 else (
            "no tests" if proc.returncode == 5 else "FAIL")
        if proc.returncode not in (0, 5):
            failed.append(f)
            print(proc.stdout)
            print(proc.stderr[-4000:], file=sys.stderr)
        total += 1
        print(f"[{i + 1:2d}/{len(files)}] {f:<28s} {status:>8s}  "
              f"{time.time() - t1:6.1f}s  {tail}", flush=True)

    dt = time.time() - t0
    if failed:
        print(f"\n{len(failed)}/{total} files FAILED in {dt:.0f}s: {failed}")
        sys.exit(1)
    print(f"\nall {total} test files passed in {dt:.0f}s")


if __name__ == "__main__":
    main()
