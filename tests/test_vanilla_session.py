"""The pre-submission environment gate (VERDICT r3 #2).

Round 3's only driver failures were environment divergence: two qids passed
every local check under ``session.py``'s configured session and errored in
the driver's plain ``SparkSession``. This test closes that class of bug for
good: it executes EVERY catalog fn under a bare vanilla session — no
session.py confs, in a separate JVM so no conf set by the test session can
leak in — and fails if any qid needs a conf it does not set itself.

Execution-only (no DuckDB compare): value parity is the full driver_sim
sweep's job (CORRECTNESS_FULL logs); this test pins "runs anywhere".
Runs at sf0.001 to keep it a smoke-scale gate.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_catalog_fn_runs_under_conf_less_session():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "driver_sim.py"),
            "--vanilla",
            "--exec-only",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-15:])
    assert proc.returncode == 0, f"vanilla exec sweep failed:\n{tail}\n{proc.stderr[-2000:]}"
