"""Two-process jax.distributed data-parallel training test.

The reference has no distributed execution at all (SURVEY.md §2.3); the
TPU-native scale-out contract is data parallelism over a global mesh
with `jax.distributed.initialize` for multi-host. This test runs the
REAL thing on CPU: two OS processes, 4 virtual devices each, one
8-device global mesh, gradient all-reduce over gloo — and asserts both
processes converge to the identical replicated parameters.
"""

import os
import socket
import subprocess
import sys

def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_training():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_NUM_CPU_DEVICES="4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), "3"],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("DIST_RESULT"):
                kv = dict(f.split("=") for f in line.split()[1:])
                results[int(kv["pid"])] = (
                    float(kv["loss"]),
                    float(kv["checksum"]),
                )
    assert set(results) == {0, 1}, outs
    # both processes hold the same replicated state after 3 psum'd steps
    assert results[0] == results[1], results
