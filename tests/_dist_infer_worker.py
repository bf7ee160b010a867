"""Worker for the 2-process multi-host inference test (NOT a test
module — spawned by tests/test_infer_dp.py).

Each process streams its stripe of the reads through the full inference
pipeline over its 4 local virtual CPU devices; process 0 merges the
per-host BAM parts. Prints the GLOBAL merged record count.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
ckpt, pod5, bam, out_bam = sys.argv[3:7]

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2
assert jax.local_device_count() == 4

from remora_tpu.infer.infer import (  # noqa: E402
    ModelHandle,
    infer_from_pod5_and_bam,
)

n = infer_from_pod5_and_bam(
    pod5_path=pod5,
    in_bam_path=bam,
    models=[ModelHandle.load(ckpt)],
    out_bam_path=out_bam,
    batch_size=128,
)
print(f"INFER_RESULT pid={pid} n={n}", flush=True)
