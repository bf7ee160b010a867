"""Device mesh + data-parallel sharding utilities.

The reference has no device parallelism (SURVEY.md §2.3); the TPU-native
scale-out is pure data parallelism over a 1-D ``data`` mesh: parameters,
optimizer and BN state replicated, batches sharded along the leading
axis. Under ``jax.jit`` with these shardings XLA inserts the gradient
all-reduce (psum over ICI) automatically; multi-host execution only
additionally needs ``jax.distributed.initialize`` (see ``init_multihost``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from remora_tpu import log
from remora_tpu.constants import DEFAULT_MESH_AXIS

LOGGER = log.get_logger()


def make_mesh(devices=None, axis_name=DEFAULT_MESH_AXIS):
    """1-D data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh, axis_name=DEFAULT_MESH_AXIS):
    """Shard leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis_name=DEFAULT_MESH_AXIS):
    """Place a dict of host arrays onto the mesh, batch-sharded."""
    sh = data_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def host_shard_to_global(mesh, local_arrays, axis_name=DEFAULT_MESH_AXIS):
    """Assemble per-process local batch shards into global sharded arrays.

    Every process passes its own disjoint slice of the global batch;
    ``jax.make_array_from_process_local_data`` places each shard on the
    local devices of the 1-D mesh so the jitted DP step sees one global
    batch without any host gather.
    """
    sh = data_sharding(mesh, axis_name)
    return {
        name: jax.make_array_from_process_local_data(sh, arr)
        for name, arr in local_arrays.items()
    }


def init_multihost(coordinator_address=None, num_processes=None,
                   process_id=None):
    """Initialize cross-host collectives (no-op when single-host)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    LOGGER.info(
        f"jax.distributed initialized: process {jax.process_index()} of "
        f"{jax.process_count()}, {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices"
    )


def make_dp_train_step(model, tx, mesh, axis_name=DEFAULT_MESH_AXIS,
                       high_conf_incorrect_thr_frac=None):
    """Data-parallel jitted train step over a mesh.

    Params/bn/opt replicated, batch sharded on the leading axis; the
    loss mean and BN batch statistics are global reductions, so XLA
    lowers the backward pass with a psum over ``axis_name`` ICI.
    """
    from remora_tpu.train.train import make_train_step

    step = make_train_step(
        model,
        tx,
        high_conf_incorrect_thr_frac=high_conf_incorrect_thr_frac,
        donate=False,
    )
    repl = replicated(mesh)
    dsh = data_sharding(mesh, axis_name)

    jit_step = jax.jit(
        lambda params, bn, opt, sigs, kmers, labels: step(
            params, bn, opt, sigs, kmers, labels
        ),
        in_shardings=(repl, repl, repl, dsh, dsh, dsh),
        out_shardings=(repl, repl, repl, repl, repl, None),
        donate_argnums=(0, 1, 2),
    )
    return jit_step


def make_dp_eval_step(model, mesh, axis_name=DEFAULT_MESH_AXIS):
    repl = replicated(mesh)
    dsh = data_sharding(mesh, axis_name)

    @partial(
        jax.jit,
        in_shardings=(repl, repl, dsh, dsh),
        out_shardings=dsh,
    )
    def eval_step(params, bn_state, sigs, enc_kmers):
        logits, _ = model.forward(params, bn_state, sigs, enc_kmers,
                                  train=False)
        return logits

    return eval_step
