"""Worker for the sharded-input multihost DP test (NOT a test module —
spawned by tests/test_multihost.py).

Each of 2 processes streams a DISJOINT super-batch stripe of the same
on-disk dataset, contributes its half of every global batch via
``jax.make_array_from_process_local_data``, and runs real DP train steps
(gradients psum'd over gloo). Prints a parameter checksum; the parent
test compares it against single-process training on the concatenated
batches.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
ds_path = sys.argv[3]
nsteps = int(sys.argv[4])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402
import optax  # noqa: E402

from remora_tpu.data.dataset import (  # noqa: E402
    ComposedDataset,
    CoreDataset,
    shard_for_process,
)
from remora_tpu.models.registry import get_model  # noqa: E402
from remora_tpu.parallel import mesh as M  # noqa: E402

assert jax.device_count() == 8 and jax.local_device_count() == 4

GLOBAL_BATCH = 32
SUPER_BATCH = 64

ds = ComposedDataset(
    [CoreDataset(ds_path, override_metadata={"chunk_context": (50, 50)})],
    np.ones(1),
    batch_size=GLOBAL_BATCH // 2,
    super_batch_size=SUPER_BATCH,
)
shard_for_process(ds, jax.process_index(), 2)

model = get_model("Conv_w_ref")
params, bn = model.init(
    jax.random.PRNGKey(0), size=8, kmer_len=ds.metadata.kmer_len,
    num_out=ds.metadata.num_labels,
)
tx = optax.adamw(1e-3)
opt = tx.init(params)

mesh = M.make_mesh()
step = M.make_dp_train_step(model, tx, mesh)
params = M.replicate(mesh, params)
bn = M.replicate(mesh, bn)
opt = M.replicate(mesh, opt)

batch_iter = ds.iter_batches()
for _ in range(nsteps):
    local = next(batch_iter)
    gb = M.host_shard_to_global(
        mesh,
        {
            "signal": np.ascontiguousarray(local["signal"], np.float32),
            "enc_kmers": np.ascontiguousarray(local["enc_kmers"], np.float32),
            "labels": np.ascontiguousarray(local["labels"]),
        },
    )
    params, bn, opt, loss, _n_filt, _gm = step(
        params, bn, opt, gb["signal"], gb["enc_kmers"], gb["labels"]
    )

checksum = float(
    sum(np.abs(np.asarray(x)).sum() for x in jax.tree_util.tree_leaves(params))
)
print(
    f"DIST_RESULT pid={pid} loss={float(loss):.6f} checksum={checksum:.8f}",
    flush=True,
)
