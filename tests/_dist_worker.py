"""Worker for the 2-process jax.distributed training test (NOT a test
module — spawned by tests/test_multihost.py).

Each process owns 4 virtual CPU devices; together they form one 8-device
global data mesh. Runs real data-parallel train steps (gradients
all-reduced over gloo) and prints a parameter checksum for cross-process
comparison.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
nsteps = int(sys.argv[3])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402
import optax  # noqa: E402

from remora_tpu.models.registry import get_model  # noqa: E402
from remora_tpu.parallel import mesh as M  # noqa: E402

assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

model = get_model("Conv_w_ref")
params, bn = model.init(jax.random.PRNGKey(0), size=8, kmer_len=3)
tx = optax.adamw(1e-3)
opt = tx.init(params)

mesh = M.make_mesh()
step = M.make_dp_train_step(model, tx, mesh)
params = M.replicate(mesh, params)
bn = M.replicate(mesh, bn)
opt = M.replicate(mesh, opt)

rng = np.random.default_rng(5)
dsh = M.data_sharding(mesh)
for _ in range(nsteps):
    sigs = rng.standard_normal((32, 1, 100)).astype(np.float32)
    kmers = rng.standard_normal((32, 12, 100)).astype(np.float32)
    labels = rng.integers(0, 2, 32)
    params, bn, opt, loss, _n_filt, _gm = step(
        params,
        bn,
        opt,
        jax.device_put(sigs, dsh),
        jax.device_put(kmers, dsh),
        jax.device_put(labels, dsh),
    )

checksum = float(
    sum(np.abs(np.asarray(x)).sum() for x in jax.tree_util.tree_leaves(params))
)
print(f"DIST_RESULT pid={pid} loss={float(loss):.6f} checksum={checksum:.6f}",
      flush=True)
