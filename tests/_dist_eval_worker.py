"""Worker for the 2-process sharded-validation test (NOT a test module —
spawned by tests/test_multihost.py).

Builds a seeded model + validation batch (identical in every process and
in the parent), evaluates it through the multi-host sharded eval_fn
(each process feeds 1/2 of every batch), and prints a digest of the
full logits for bit-exact comparison against the parent's single-device
reference.
"""

import hashlib
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
dump_path = sys.argv[3] if len(sys.argv) > 3 else None

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402

from remora_tpu.models.registry import get_model  # noqa: E402
from remora_tpu.parallel import mesh as M  # noqa: E402

model = get_model("Conv_w_ref")
params, bn = model.init(jax.random.PRNGKey(7), size=8, kmer_len=3)
mesh = M.make_mesh()
params = M.replicate(mesh, params)
bn = M.replicate(mesh, bn)
eval_fn = M.make_dp_eval_fn(model, mesh)

rng = np.random.default_rng(11)
digests = []
dumps = {}
for n_rows in (32, 37):  # full and ragged batches
    sigs = rng.standard_normal((n_rows, 1, 100)).astype(np.float32)
    kmers = rng.standard_normal((n_rows, 12, 100)).astype(np.float32)
    logits = eval_fn(params, bn, sigs, kmers)
    assert logits.shape == (n_rows, 2), logits.shape
    digests.append(hashlib.sha256(np.ascontiguousarray(logits)).hexdigest())
    dumps[f"logits_{n_rows}"] = logits
if dump_path is not None:
    np.savez(f"{dump_path}.pid{pid}.npz", **dumps)
print(f"EVAL_RESULT pid={pid} digests={','.join(digests)}", flush=True)
