"""The driver's perf evidence chain: bench.py must ALWAYS emit one
parseable JSON record — a real measurement or a structured error —
whatever the TPU backend does (hang, fast init raise, transient outage).

Round-2 post-mortem: a fast backend-init raise escaped straight through
as a traceback and the driver recorded ``parsed: null``. These tests pin
the supervised capture path so that cannot regress.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

BENCH = str(Path(__file__).resolve().parent.parent / "bench.py")


def _run_bench(extra_env, timeout=420):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    lines = [
        ln for ln in proc.stdout.strip().splitlines()
        if ln.strip().startswith("{")
    ]
    assert lines, f"no JSON line in stdout: {proc.stdout!r} / {proc.stderr!r}"
    return proc.returncode, json.loads(lines[-1])


def test_raising_child_yields_structured_error_record():
    rc, rec = _run_bench({
        "REMORA_TPU_BENCH_FAIL": "synthetic backend init failure",
        "REMORA_TPU_BENCH_TOTAL_BUDGET": "125",
        "REMORA_TPU_BENCH_BACKOFF": "0.1",
    })
    assert rc != 0
    assert rec["metric"] == "infer_fwd_chunks_per_s_per_chip"
    assert rec["value"] == 0.0
    assert "synthetic backend init failure" in " ".join(rec["attempts"])
    assert "error" in rec


@pytest.mark.slow
def test_cpu_measurement_yields_parseable_record():
    rc, rec = _run_bench({"REMORA_TPU_BENCH_FORCE_CPU": "1"})
    assert rc == 0
    assert rec["metric"] == "infer_fwd_chunks_per_s_per_chip"
    assert rec["value"] > 0
    assert rec["platform"] == "cpu"
    assert "error" not in rec
    assert rec["attempts"] == 1
