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
from jax.experimental.shard_map import shard_map
from jax.flatten_util import ravel_pytree
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
    """Place a pytree replicated across the mesh.

    Note: on single-process backends ``device_put`` may ALIAS one shard
    of the replicated array with the input buffer, so donating the
    result to a jitted step (as the DP train step does) also invalidates
    the original arrays — rebind and never reuse the un-replicated tree
    after the first step.
    """
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
                       high_conf_incorrect_thr_frac=None,
                       compute_dtype=None, sync_bn=False,
                       use_grad_clip=False, featurize_args=None):
    """Data-parallel jitted train step over a mesh.

    Default (``sync_bn=False``): an explicit ``shard_map`` step that
    computes per-device gradients and reduces EVERYTHING in one fused
    collective — gradients, BN running statistics, loss, and the
    filtered-chunk count ride a single flat ``pmean`` vector. Collective
    launches, not bytes, dominate small-model DP steps over DCN (and
    dramatically so over the CPU/gloo test backend: ~5ms per launch vs
    1.6ms for one fused 128KB pmean), so one launch per step is the
    scalable layout. BatchNorm batch statistics are per-device (the
    standard unsynced-BN data-parallel recipe); running stats are
    averaged every step, so checkpoints remain topology-independent.
    Gradient-clip maxima are taken on the reduced (global) gradients, so
    no extra collective is needed for them either. The
    high-confidence-incorrect filter computes its dynamic threshold per
    device shard (shuffled batches make the per-shard top-k an unbiased
    stand-in for the global one), but the loss/gradient weighting of the
    surviving chunks is EXACT: the collective reduces the loss sum and
    kept count, and the global masked mean is reconstructed after it.
    ``sync_bn=True`` restores fully global semantics for everything.

    ``sync_bn=True``: global-batch BN via jit sharding constraints — XLA
    inserts per-layer stat reductions; bit-matches single-device
    training at any device count, at the cost of 2 collectives per BN
    layer per direction.

    ``featurize_args=(kmer_context_bases, chunk_width)`` switches the
    step to RAW batch inputs (signal, sequence, seq_to_sig_map,
    seq_lens, labels): the encoded-kmer featurization runs shard-local
    on device, so each host ships compact int8/int16 arrays.
    """
    from remora_tpu.train.train import (
        make_loss_fn,
        make_train_step,
        make_train_step_raw,
    )

    repl = replicated(mesh)
    dsh = data_sharding(mesh, axis_name)
    raw = featurize_args is not None
    n_data_args = 5 if raw else 3

    if sync_bn:
        if raw:
            (bb_ab, chunk_width) = featurize_args
            step = make_train_step_raw(
                model, tx, bb_ab, chunk_width,
                high_conf_incorrect_thr_frac=high_conf_incorrect_thr_frac,
                use_grad_clip=use_grad_clip,
                compute_dtype=compute_dtype, donate=False,
            )
        else:
            step = make_train_step(
                model, tx,
                high_conf_incorrect_thr_frac=high_conf_incorrect_thr_frac,
                use_grad_clip=use_grad_clip,
                compute_dtype=compute_dtype, donate=False,
            )
        n_extra = 1 if use_grad_clip else 0
        return jax.jit(
            lambda params, bn, opt, *rest: step(params, bn, opt, *rest),
            in_shardings=(repl, repl, repl)
            + (dsh,) * n_data_args
            + (repl,) * n_extra,
            out_shardings=(repl, repl, repl, repl, repl,
                           repl if use_grad_clip else None),
            donate_argnums=(0, 1, 2),
        )

    # With the filter active, per-shard masked MEANS would weight shards
    # equally regardless of how many chunks each filtered; reducing the
    # loss SUM + kept count instead reconstructs the exact global masked
    # mean (and its gradients) after the collective.
    loss_fn = make_loss_fn(
        model,
        high_conf_incorrect_thr_frac=high_conf_incorrect_thr_frac,
        compute_dtype=compute_dtype,
        reduction="sum",
        channels_last=raw,  # raw path featurizes channels-last on device
    )
    if raw:
        from remora_tpu.kernels.encoded_kmers import (
            compute_encoded_kmer_batch as dev_enc,
        )

        (bb, ab), chunk_width = featurize_args

    def local_step(params, bn_state, opt_state, *rest):
        if raw:
            signal, sequence, seq_maps, seq_lens, labels = rest[:5]
            kmers = dev_enc(
                bb, ab, sequence, seq_maps, seq_lens, chunk_width,
                out_dtype=compute_dtype, channels_last=True,
            )
            sigs = jnp.swapaxes(signal, 1, 2)
        else:
            sigs, kmers, labels = rest[:3]
        grad_threshs = rest[n_data_args] if use_grad_clip else None
        (loss_sum, (new_bn, n_filt, n_kept)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, bn_state, sigs, kmers, labels)
        flat_g, unravel_g = ravel_pytree(grads)
        flat_bn, unravel_bn = ravel_pytree(new_bn)
        packed = jnp.concatenate(
            [
                flat_g,
                flat_bn,
                loss_sum[None],
                n_kept[None],
                n_filt.astype(jnp.float32)[None],
            ]
        )
        packed = jax.lax.pmean(packed, axis_name)  # the ONE collective
        ng = flat_g.shape[0]
        nb = flat_bn.shape[0]
        kept_mean = packed[ng + nb + 1]  # global kept / n_devs
        grads = unravel_g(packed[:ng] / kept_mean)
        new_bn = unravel_bn(packed[ng : ng + nb])
        loss = packed[ng + nb] / kept_mean
        n_devs = jax.lax.axis_size(axis_name)
        n_filt = jnp.round(packed[ng + nb + 2] * n_devs).astype(jnp.int32)
        if use_grad_clip:
            grad_maxs = jax.tree.map(lambda g: jnp.max(jnp.abs(g)), grads)
            if grad_threshs is not None:
                grads = jax.tree.map(
                    lambda g, t: jnp.clip(g, -t, t), grads, grad_threshs
                )
        else:
            grad_maxs = None
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return new_params, new_bn, new_opt, loss, n_filt, grad_maxs

    n_extra = 1 if use_grad_clip else 0
    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P())
        + (P(axis_name),) * n_data_args
        + (P(),) * n_extra,
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_dp_eval_step(model, mesh, axis_name=DEFAULT_MESH_AXIS):
    """Batch-sharded eval forward; logits replicate back to every host
    (the per-batch logit tensor is tiny, and a replicated output is what
    lets multihost validation write identical logs on every process)."""
    repl = replicated(mesh)
    dsh = data_sharding(mesh, axis_name)

    @partial(
        jax.jit,
        in_shardings=(repl, repl, dsh, dsh),
        out_shardings=repl,
    )
    def eval_step(params, bn_state, sigs, enc_kmers):
        logits, _ = model.forward(params, bn_state, sigs, enc_kmers,
                                  train=False)
        return logits

    return eval_step


def make_dp_eval_fn(model, mesh, axis_name=DEFAULT_MESH_AXIS):
    """Validation eval_fn factory over a (possibly multi-host) mesh.

    Returns ``eval_fn(params, bn_state, sigs, enc_kmers) -> np logits``
    accepting ragged host batches: rows are padded to the device count,
    sharded over the mesh (each process contributes only its 1/n_proc
    slice — a process computes 1/n_proc of every validation batch,
    SURVEY §2.3), and the replicated logits are fetched and sliced back.
    The logits are bit-identical on every PROCESS (replicated output of
    one global computation) and match the single-device
    ``train.make_eval_step`` path to within a few ulp (row math is
    identical; XLA codegen may tile reductions differently for the
    per-shard shape). Reference analog of what this parallelizes:
    ``src/remora/validate.py:190–259``.
    """
    step = make_dp_eval_step(model, mesh, axis_name)
    dsh = data_sharding(mesh, axis_name)
    n_dev = int(np.prod(mesh.devices.shape))
    n_proc = jax.process_count()
    multihost = n_proc > 1

    from remora_tpu.core.util import pad_rows

    def eval_fn(params, bn_state, sigs, enc_kmers):
        sigs = np.asarray(sigs)
        enc_kmers = np.asarray(enc_kmers)
        n = sigs.shape[0]
        n_full = -(-n // n_dev) * n_dev
        if n_full != n:
            sigs = pad_rows(sigs, n_full)
            enc_kmers = pad_rows(enc_kmers, n_full)
        if multihost:
            per = n_full // n_proc
            lo = jax.process_index() * per
            sigs, enc_kmers = (
                jax.make_array_from_process_local_data(
                    dsh, a[lo : lo + per]
                )
                for a in (sigs, enc_kmers)
            )
        else:
            sigs = jax.device_put(sigs, dsh)
            enc_kmers = jax.device_put(enc_kmers, dsh)
        return np.asarray(step(params, bn_state, sigs, enc_kmers))[:n]

    return eval_fn
