"""Training driver: jitted train/eval steps + epoch loop.

Reference analog ``src/remora/train_model.py:164–643``. The compute path
is a single jitted step (forward, CE loss with optional high-confidence-
incorrect masking, backward, optimizer update, optional value clipping)
over fixed shapes; host code only streams batches and handles the epoch
schedule, validation, checkpointing and early stopping.

Data-parallel scale-out: pass ``mesh`` to shard the batch across devices
(see remora_tpu.parallel.data_parallel) — gradients merge inside jit via
the sharded computation (XLA inserts the psum).
"""

import json
import os
import time
from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remora_tpu import RemoraError, constants, log
from remora_tpu.data.dataset import ComposedDataset, CoreDataset, load_dataset
from remora_tpu.models import layers as L
from remora_tpu.models import model_io
from remora_tpu.models.registry import get_model
from remora_tpu.train.optim import RollingMAD, TrainOpts
from remora_tpu.train.validate import ValidationLogger

LOGGER = log.get_logger()
BREACH_THRESHOLD = 0.8
REGRESSION_THRESHOLD = 0.7


def cross_entropy_loss(logits, labels):
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def make_train_step_raw(model, tx, kmer_context_bases, chunk_width,
                        high_conf_incorrect_thr_frac=None,
                        use_grad_clip=False, donate=True,
                        compute_dtype=None):
    """Jitted train step taking RAW ragged arrays; the encoded-kmer
    featurization runs on device (remora_tpu.kernels.encoded_kmers), so
    each step ships compact int8/int16 arrays instead of the ~50x larger
    float features."""
    from remora_tpu.kernels.encoded_kmers import (
        compute_encoded_kmer_batch as dev_enc,
    )

    bb, ab = kmer_context_bases
    inner = make_train_step(
        model,
        tx,
        high_conf_incorrect_thr_frac=high_conf_incorrect_thr_frac,
        use_grad_clip=use_grad_clip,
        donate=False,
        compute_dtype=compute_dtype,
        channels_last=True,
    )

    def step(params, bn_state, opt_state, signal, sequence, seq_maps,
             seq_lens, labels, grad_threshs=None):
        # channels-last hot path: the featurizer emits (B, W, 4K) for
        # free and the (B, 1, W) signal swap is a tiny relayout —
        # the towers then run without any NCH->NHC entry transposes
        enc_kmers = dev_enc(
            bb, ab, sequence, seq_maps, seq_lens, chunk_width,
            out_dtype=compute_dtype, channels_last=True,
        )
        return inner(
            params, bn_state, opt_state, jnp.swapaxes(signal, 1, 2),
            enc_kmers, labels,
            *(() if grad_threshs is None else (grad_threshs,)),
        )

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_train_step_raw_multi(model, tx, kmer_context_bases, chunk_width,
                              steps_per_launch,
                              high_conf_incorrect_thr_frac=None,
                              use_grad_clip=False, donate=True,
                              compute_dtype=None):
    """K optimizer steps per device launch: ``lax.scan`` over K stacked
    raw batches inside ONE jitted call.

    One launch RPC (and one host dispatch) covers K steps — on a
    high-latency client link (the tunneled single-chip environment pays
    ~2ms/launch; real pods pay less but not zero) this removes the
    per-step dispatch gap entirely, and the stacked int inputs are tiny
    (the raw path ships int8/int16, not float features). Numerics per
    step are identical to ``make_train_step_raw``; the only semantic
    difference is that adaptive grad-clip thresholds are frozen within a
    launch window — per-step grad maxima come back stacked so the host
    RollingMAD updates once per launch with all K values.

    Step signature: ``step(params, bn_state, opt_state, signal[K,B,1,W],
    seqs[K,B,S+ctx], maps[K,B,S+1], lens[K,B], labels[K,B],
    grad_threshs?) -> (params, bn_state, opt_state, losses[K],
    n_filt[K], grad_maxs[K-stacked pytree] | None)``.
    """
    from remora_tpu.kernels.encoded_kmers import (
        compute_encoded_kmer_batch as dev_enc,
    )

    bb, ab = kmer_context_bases
    loss_fn = make_loss_fn(
        model,
        high_conf_incorrect_thr_frac=high_conf_incorrect_thr_frac,
        compute_dtype=compute_dtype,
        channels_last=True,
    )

    def one_step(params, bn_state, opt_state, signal, seqs, maps, lens,
                 labels, grad_threshs):
        enc = dev_enc(
            bb, ab, seqs, maps, lens, chunk_width,
            out_dtype=compute_dtype, channels_last=True,
        )
        (loss, (new_bn, n_filt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, bn_state, jnp.swapaxes(signal, 1, 2), enc, labels)
        if use_grad_clip:
            grad_maxs = jax.tree.map(lambda g: jnp.max(jnp.abs(g)), grads)
            if grad_threshs is not None:
                grads = jax.tree.map(
                    lambda g, t: jnp.clip(g, -t, t), grads, grad_threshs
                )
        else:
            grad_maxs = None
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, loss, n_filt, grad_maxs

    def multi(params, bn_state, opt_state, signal, seqs, maps, lens,
              labels, grad_threshs=None):
        def body(carry, xs):
            p, bn, opt = carry
            p, bn, opt, loss, n_filt, gm = one_step(
                p, bn, opt, *xs, grad_threshs
            )
            ys = (loss, n_filt) if gm is None else (loss, n_filt, gm)
            return (p, bn, opt), ys

        (params, bn_state, opt_state), ys = jax.lax.scan(
            body,
            (params, bn_state, opt_state),
            (signal, seqs, maps, lens, labels),
            length=steps_per_launch,
        )
        if use_grad_clip:
            losses, n_filts, grad_maxs = ys
        else:
            (losses, n_filts), grad_maxs = ys, None
        return params, bn_state, opt_state, losses, n_filts, grad_maxs

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(multi, donate_argnums=donate_argnums)


def make_loss_fn(model, high_conf_incorrect_thr_frac=None,
                 compute_dtype=None, reduction="mean",
                 channels_last=False):
    """CE loss closure shared by the single-device and data-parallel
    steps: ``loss_fn(params, bn_state, sigs, enc_kmers, labels) ->
    (loss, (new_bn_state, n_filtered))``.

    ``reduction="sum"`` returns the SUM of kept per-example losses and
    an extra aux element ``n_kept`` — the DP step uses it to reconstruct
    the exact global masked mean after the cross-device reduction
    (per-shard masked means would weight shards equally regardless of
    how many chunks each filtered)."""

    def outer_loss_fn(params, bn_state, sigs, enc_kmers, labels):
        def loss_fn(p):
            if compute_dtype is not None:
                cast = lambda t: jax.tree.map(  # noqa: E731
                    lambda x: x.astype(compute_dtype)
                    if x.dtype == jnp.float32
                    else x,
                    t,
                )
                logits, new_bn = model.forward(
                    cast(p),
                    cast(bn_state),
                    sigs.astype(compute_dtype),
                    enc_kmers.astype(compute_dtype),
                    train=True,
                    channels_last_in=channels_last,
                )
                logits = logits.astype(jnp.float32)
                new_bn = jax.tree.map(
                    lambda x: x.astype(jnp.float32), new_bn
                )
            else:
                logits, new_bn = model.forward(
                    p, bn_state, sigs, enc_kmers, train=True,
                    channels_last_in=channels_last,
                )
            logp = jax.nn.log_softmax(logits)
            per_ex = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            if high_conf_incorrect_thr_frac is None:
                n_kept = jnp.float32(per_ex.shape[0])
                loss = (
                    jnp.sum(per_ex)
                    if reduction == "sum"
                    else jnp.mean(per_ex)
                )
                n_filt = jnp.zeros((), jnp.int32)
            else:
                conf_thresh, max_frac_skip = high_conf_incorrect_thr_frac
                bsz = logits.shape[0]
                max_nr_skip = int(np.floor(bsz * max_frac_skip))
                preds = jax.nn.softmax(jax.lax.stop_gradient(logits), axis=1)
                highest_preds = jnp.max(preds, axis=1)
                high_conf_cl = jnp.argmax(preds, axis=1)
                cl_match = labels == high_conf_cl
                n_mm = bsz - jnp.sum(cl_match)
                # confidences of mismatched examples, descending
                mm_preds = jnp.where(cl_match, -jnp.inf, highest_preds)
                mm_sorted = -jnp.sort(-mm_preds)
                dyn_thresh = jnp.where(
                    n_mm > max_nr_skip,
                    jnp.maximum(conf_thresh, mm_sorted[max_nr_skip]),
                    conf_thresh,
                )
                mask = jnp.logical_or(cl_match, highest_preds < dyn_thresh)
                n_filt = (bsz - jnp.sum(mask)).astype(jnp.int32)
                n_kept = jnp.maximum(jnp.sum(mask), 1).astype(jnp.float32)
                loss = jnp.sum(per_ex * mask)
                if reduction != "sum":
                    loss = loss / n_kept
            if reduction == "sum":
                return loss, (new_bn, n_filt, n_kept)
            return loss, (new_bn, n_filt)

        return loss_fn(params)

    return outer_loss_fn


def make_train_step(model, tx, high_conf_incorrect_thr_frac=None,
                    use_grad_clip=False, donate=True, compute_dtype=None,
                    channels_last=False):
    """Build the jitted training step for one model architecture.

    ``compute_dtype`` (e.g. jnp.bfloat16) runs the forward/backward in
    reduced precision against full-precision master weights: parameters
    and activations are cast on entry, gradients flow back as f32 into
    the f32 AdamW state (standard mixed-precision recipe; ~MXU-rate
    matmuls on TPU)."""
    loss_fn = make_loss_fn(
        model,
        high_conf_incorrect_thr_frac=high_conf_incorrect_thr_frac,
        compute_dtype=compute_dtype,
        channels_last=channels_last,
    )

    def step(params, bn_state, opt_state, sigs, enc_kmers, labels,
             grad_threshs=None):
        (loss, (new_bn, n_filt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, bn_state, sigs, enc_kmers, labels)
        if use_grad_clip:
            grad_maxs = jax.tree.map(lambda g: jnp.max(jnp.abs(g)), grads)
            if grad_threshs is not None:
                grads = jax.tree.map(
                    lambda g, t: jnp.clip(g, -t, t), grads, grad_threshs
                )
        else:
            grad_maxs = None
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, loss, n_filt, grad_maxs

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def _write_batch_line(batch_fp, entry, high_conf_incorrect_thr_frac):
    """Write one batch.log row, converting the (lagged) device scalars."""
    it, loss, n_filt = entry
    batch_fp.write(f"{it}\t{float(loss):.6f}")
    if high_conf_incorrect_thr_frac is not None:
        batch_fp.write(f"\t{int(n_filt)}")
    batch_fp.write("\n")


def make_eval_step(model):
    @jax.jit
    def eval_step(params, bn_state, sigs, enc_kmers):
        logits, _ = model.forward(params, bn_state, sigs, enc_kmers,
                                  train=False)
        return logits
    return eval_step


def set_learning_rate(opt_state, lr):
    """Update the injected learning-rate hyperparameter (searches nested
    optax states for the InjectHyperparamsState)."""
    found = _set_lr_recursive(opt_state, lr)
    if not found:
        raise RemoraError("No injectable learning rate in optimizer state")
    return opt_state


def _set_lr_recursive(state, lr):
    if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
        state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return True
    if isinstance(state, (tuple, list)):
        return any(_set_lr_recursive(s, lr) for s in state)
    if hasattr(state, "inner_state"):
        return _set_lr_recursive(state.inner_state, lr)
    if hasattr(state, "inner_states"):
        return any(
            _set_lr_recursive(s, lr) for s in state.inner_states.values()
        )
    return False


def train_model(
    seed,
    out_path,
    remora_dataset_path,
    chunk_context,
    kmer_context_bases,
    batch_size,
    model_name,
    size,
    train_opts: TrainOpts,
    chunks_per_epoch,
    num_test_chunks,
    save_freq=10,
    filt_frac=constants.DEFAULT_FILT_FRAC,
    ext_val=None,
    ext_val_names=None,
    high_conf_incorrect_thr_frac=None,
    finetune_path=None,
    freeze_num_layers=0,
    super_batch_size=constants.DEFAULT_SUPER_BATCH_SIZE,
    super_batch_sample_frac=None,
    gradient_clip_num_mads=None,
    mesh=None,
    featurize_on_device=True,
    resume_from_checkpoint=None,
    bf16_compute=False,
    sync_bn=False,
    read_batches_from_disk=False,
    steps_per_launch=1,
):
    from remora_tpu.jax_setup import ensure_compilation_cache

    ensure_compilation_cache()
    out_path = str(out_path)
    os.makedirs(out_path, exist_ok=True)
    seed = (
        np.random.randint(0, np.iinfo(np.uint32).max, dtype=np.uint32)
        if seed is None
        else seed
    )
    LOGGER.info(f"Seed selected is {seed}")
    np.random.seed(int(seed))
    rng = jax.random.PRNGKey(int(seed))

    LOGGER.info("Loading dataset from dataset config")
    override_metadata = {"extra_arrays": {}}
    if kmer_context_bases is not None:
        override_metadata["kmer_context_bases"] = kmer_context_bases
    if chunk_context is not None:
        override_metadata["chunk_context"] = chunk_context
    paths, props, hashes = load_dataset(str(remora_dataset_path))
    dataset = ComposedDataset(
        [
            CoreDataset(path, override_metadata=override_metadata.copy())
            for path in paths
        ],
        props,
        hashes,
        batch_size=batch_size,
        super_batch_size=super_batch_size,
        super_batch_sample_frac=super_batch_sample_frac,
    )
    with open(os.path.join(out_path, "dataset_config.jsn"), "w") as fh:
        json.dump(dataset.get_config(), fh)
    dataset.metadata.write(os.path.join(out_path, "dataset_metadata.jsn"))
    LOGGER.info(f"Dataset summary:\n{dataset.summary}")

    val_fp = open(os.path.join(out_path, "validation.log"), "w", buffering=1)
    val_logger = ValidationLogger(val_fp)
    batch_fp = open(os.path.join(out_path, "batch.log"), "w", buffering=1)
    if high_conf_incorrect_thr_frac is not None:
        batch_fp.write("Iteration\tLoss\tNumberFiltered\n")
    else:
        batch_fp.write("Iteration\tLoss\n")

    LOGGER.info("Loading model")
    model = get_model(model_name)
    model_params = {
        "size": size,
        "kmer_len": dataset.metadata.kmer_len,
        "num_out": dataset.metadata.num_labels,
    }
    params, bn_state = model.init(rng, **model_params)

    if finetune_path is not None:
        f_model, f_params, f_bn, f_meta = model_io.load_model(finetune_path)
        if tuple(f_meta["chunk_context"]) != tuple(
            dataset.metadata.chunk_context
        ):
            raise RemoraError(
                "The chunk context of the pre-trained model and the dataset "
                "do not match."
            )
        if tuple(f_meta["kmer_context_bases"]) != tuple(
            dataset.metadata.kmer_context_bases
        ):
            raise RemoraError(
                "The kmer context bases of the pre-trained model and the "
                "dataset do not match."
            )
        model = f_model
        if f_meta["model_params"]["num_out"] != dataset.metadata.num_labels:
            # swap classification head for new label space
            in_feat = f_params["fc"]["w"].shape[1]
            head_rng = jax.random.fold_in(rng, 1)
            f_params["fc"] = L.linear_init(
                head_rng, in_feat, dataset.metadata.num_labels
            )
        params = jax.tree.map(jnp.asarray, f_params)
        bn_state = jax.tree.map(jnp.asarray, f_bn)
        model_params["size"] = f_meta["model_params"]["size"]
        LOGGER.info(f"Fine-tuning from {finetune_path}")
        # NOTE: layer freezing handled via a gradient mask
    frozen_mask = None
    if finetune_path is not None and freeze_num_layers:
        flat_names = sorted(model_io.flatten_tree(params))
        frozen = set(flat_names[:freeze_num_layers])
        LOGGER.info(f"Freezing params: {sorted(frozen)}")
        frozen_flat = {
            name: name in frozen for name in flat_names
        }
        frozen_mask = model_io.unflatten_tree(frozen_flat)

    n_params = L.param_count(params)
    LOGGER.info(f"Params (k) {n_params / 1000:.2f}")

    tx = train_opts.load_optimizer()
    if frozen_mask is not None:
        import optax

        labels = jax.tree.map(
            lambda f: "frozen" if f else "train", frozen_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels
        )
    lr_schedule = train_opts.load_scheduler()
    start_epoch = 0
    if resume_from_checkpoint is not None:
        r_model, r_params, r_bn, r_meta = model_io.load_model(
            resume_from_checkpoint
        )
        model = r_model
        params = jax.tree.map(jnp.asarray, r_params)
        bn_state = jax.tree.map(jnp.asarray, r_bn)
        model_params = r_meta["model_params"]
        opt_state = tx.init(params)
        restored = model_io.load_opt_state(resume_from_checkpoint, opt_state)
        if restored is not None:
            opt_state = jax.tree.map(jnp.asarray, restored)
        start_epoch = int(r_meta.get("epoch", 0))
        LOGGER.info(
            f"Resuming from {resume_from_checkpoint} at epoch {start_epoch}"
        )
    else:
        opt_state = tx.init(params)

    LOGGER.debug("Splitting dataset")
    trn_ds, val_ds = dataset.train_test_split(
        num_test_chunks, override_metadata=override_metadata
    )
    val_ds.super_batch_sample_frac = None
    val_ds.do_check_super_batches = True
    val_trn_ds = trn_ds.head(num_test_chunks, override_metadata=override_metadata)
    val_trn_ds.super_batch_sample_frac = None
    val_trn_ds.do_check_super_batches = True
    if not read_batches_from_disk:
        val_ds.load_all_batches()
        val_trn_ds.load_all_batches()

    ext_datasets = []
    if ext_val:
        if ext_val_names is None:
            ext_val_names = [f"e_val_{i}" for i in range(len(ext_val))]
        for e_name, e_path in zip(ext_val_names, ext_val):
            e_paths, e_props, e_hashes = load_dataset(e_path.strip())
            e_ds = ComposedDataset(
                [
                    CoreDataset(
                        p,
                        override_metadata=override_metadata.copy(),
                        infinite_iter=False,
                        do_check_super_batches=True,
                    )
                    for p in e_paths
                ],
                e_props,
                e_hashes,
                batch_size=batch_size,
            )
            e_ds.update_metadata(dataset)
            if not read_batches_from_disk:
                e_ds.load_all_batches()
            ext_datasets.append((e_name, e_ds))

    use_grad_clip = gradient_clip_num_mads is not None
    batch_sharding = None
    multihost = False
    if mesh is not None:
        # data-parallel: replicate state over the mesh, shard batches on
        # the leading axis; XLA inserts the gradient psum over ICI
        from remora_tpu.parallel import mesh as mesh_mod

        params = mesh_mod.replicate(mesh, params)
        bn_state = mesh_mod.replicate(mesh, bn_state)
        opt_state = mesh_mod.replicate(mesh, opt_state)
        batch_sharding = mesh_mod.data_sharding(mesh)
        LOGGER.info(
            f"Data-parallel training over {np.prod(mesh.devices.shape)} "
            "devices"
        )
        multihost = jax.process_count() > 1
        if multihost:
            # per-host input sharding (SURVEY §2.3): every process streams
            # a disjoint super-batch stripe and contributes its slice of
            # the global batch via make_array_from_process_local_data
            from remora_tpu.data.dataset import shard_for_process

            n_proc = jax.process_count()
            if batch_size % n_proc:
                raise RemoraError(
                    f"batch size ({batch_size}) must divide evenly over "
                    f"{n_proc} processes"
                )
            shard_for_process(trn_ds, jax.process_index(), n_proc)
            trn_ds.set_batch_size(batch_size // n_proc)
            LOGGER.info(
                f"Process {jax.process_index()}/{n_proc} streams "
                f"{batch_size // n_proc} chunks per global batch "
                f"from its dataset stripe"
            )
    compute_dtype = jnp.bfloat16 if bf16_compute else None
    if bf16_compute:
        LOGGER.info("Training compute in bfloat16 (f32 master weights)")
    if mesh is not None:
        # fused-collective DP step: grads/BN/loss ride ONE pmean per step
        train_step = mesh_mod.make_dp_train_step(
            model,
            tx,
            mesh,
            high_conf_incorrect_thr_frac=high_conf_incorrect_thr_frac,
            compute_dtype=compute_dtype,
            use_grad_clip=use_grad_clip,
            sync_bn=sync_bn,
            featurize_args=(
                (
                    dataset.metadata.kmer_context_bases,
                    dataset.metadata.chunk_width,
                )
                if featurize_on_device
                else None
            ),
        )
    elif featurize_on_device:
        train_step = make_train_step_raw(
            model,
            tx,
            dataset.metadata.kmer_context_bases,
            dataset.metadata.chunk_width,
            high_conf_incorrect_thr_frac=high_conf_incorrect_thr_frac,
            use_grad_clip=use_grad_clip,
            compute_dtype=compute_dtype,
        )
    else:
        train_step = make_train_step(
            model,
            tx,
            high_conf_incorrect_thr_frac=high_conf_incorrect_thr_frac,
            use_grad_clip=use_grad_clip,
            compute_dtype=compute_dtype,
        )
    multi_step = None
    if steps_per_launch > 1:
        if mesh is None and featurize_on_device:
            # K optimizer steps per device launch over stacked raw
            # batches — amortizes per-launch dispatch on high-latency
            # client links; numerics per step identical (grad-clip
            # thresholds frozen within each launch window)
            multi_step = make_train_step_raw_multi(
                model,
                tx,
                dataset.metadata.kmer_context_bases,
                dataset.metadata.chunk_width,
                steps_per_launch,
                high_conf_incorrect_thr_frac=high_conf_incorrect_thr_frac,
                use_grad_clip=use_grad_clip,
                compute_dtype=compute_dtype,
            )
            LOGGER.info(
                f"Launching {steps_per_launch} optimizer steps per "
                "device dispatch"
            )
        else:
            LOGGER.info(
                "--steps-per-launch requires the raw (on-device "
                "featurization) single-host path; running one step per "
                "launch"
            )
            steps_per_launch = 1
    if mesh is not None:
        # sharded validation: each eval batch splits over the mesh (and,
        # multihost, each process feeds/computes only its 1/n_proc slice
        # of every batch); logits — and therefore validation.log — are
        # bit-identical ACROSS processes, and match the single-device
        # path to within a few ulp (see make_dp_eval_fn)
        dp_eval_fn = mesh_mod.make_dp_eval_fn(model, mesh)

        def eval_fn(sigs, enc_kmers):
            return dp_eval_fn(params, bn_state, sigs, enc_kmers)

    else:
        eval_step = make_eval_step(model)

        def eval_fn(sigs, enc_kmers):
            return eval_step(params, bn_state, jnp.asarray(sigs),
                             jnp.asarray(enc_kmers))

    rolling_mads = None
    grad_threshs = None
    if use_grad_clip:
        nparams_leaves = len(jax.tree_util.tree_leaves(params))
        rolling_mads = RollingMAD(nparams_leaves, gradient_clip_num_mads)

    LOGGER.info("Running initial validation")
    val_metrics = val_logger.validate_model(
        eval_fn, dataset.metadata.mod_bases, val_ds, filt_frac
    )
    trn_metrics = val_logger.validate_model(
        eval_fn, dataset.metadata.mod_bases, val_trn_ds, filt_frac, "trn"
    )
    batches_per_epoch = int(np.ceil(chunks_per_epoch / batch_size))
    with open(os.path.join(out_path, "epoch_summary.txt"), "w") as fh:
        fh.write(trn_ds.epoch_summary(batches_per_epoch) + "\n")
    best_alt_val_accs = {name: 0 for name, _ in ext_datasets}
    for ext_name, ext_ds in ext_datasets:
        val_logger.validate_model(
            eval_fn, dataset.metadata.mod_bases, ext_ds, filt_frac, ext_name
        )

    ckpt_meta, ckpt_meta_arrays = model_io.make_model_metadata(
        dataset.metadata, getattr(model, "NAME", str(model_name)), model_params
    )

    def save(name):
        model_io.save_model(
            os.path.join(out_path, name),
            jax.device_get(params),
            jax.device_get(bn_state),
            {**ckpt_meta, "epoch": epoch + 1},
            ckpt_meta_arrays,
            opt_state=jax.device_get(opt_state),
        )

    LOGGER.info("Start training")
    best_val_acc = 0
    early_stop_epochs = 0
    breached = False
    epoch = start_epoch
    trn_iter = trn_ds.iter_batches(raw=featurize_on_device)
    pending_losses = deque()
    # optional device trace of the first epoch (view with tensorboard or
    # xprof); reference analog: torch profiler via REMORA_TRAIN_PROFILE_FILE
    jax_trace_dir = os.environ.get("REMORA_TPU_JAX_TRACE_DIR")
    for epoch in range(start_epoch, train_opts.epochs):
        if jax_trace_dir is not None and epoch == 0:
            jax.profiler.start_trace(jax_trace_dir)
        opt_state = set_learning_rate(opt_state, lr_schedule(epoch))
        t0 = time.monotonic()
        n_chunks = 0
        epoch_i = 0
        while epoch_i < batches_per_epoch:
            if featurize_on_device:
                names = (
                    "signal",
                    "sequence",
                    "sequence_to_signal_mapping",
                    "sequence_lengths",
                    "labels",
                )
            else:
                names = ("signal", "enc_kmers", "labels")
            if (
                multi_step is not None
                and epoch_i + steps_per_launch <= batches_per_epoch
            ):
                batches = [next(trn_iter) for _ in range(steps_per_launch)]
                step_inputs = tuple(
                    jnp.asarray(np.stack([b[n] for b in batches]))
                    for n in names
                )
                (params, bn_state, opt_state, losses, n_filts,
                 grad_maxs) = multi_step(
                    params,
                    bn_state,
                    opt_state,
                    *step_inputs,
                    *((grad_threshs,) if use_grad_clip else ()),
                )
                n_chunks += sum(b["labels"].shape[0] for b in batches) * (
                    jax.process_count() if multihost else 1
                )
                if use_grad_clip:
                    # one RollingMAD update per step, from the stacked
                    # per-step grad maxima (thresholds were frozen
                    # within the launch window)
                    leaves = jax.tree_util.tree_leaves(grad_maxs)
                    for j in range(steps_per_launch):
                        threshs = rolling_mads.update(
                            [float(g[j]) for g in leaves]
                        )
                    if threshs is not None:
                        flat, treedef = jax.tree_util.tree_flatten(params)
                        grad_threshs = jax.tree_util.tree_unflatten(
                            treedef, [jnp.asarray(t) for t in threshs]
                        )
                for j in range(steps_per_launch):
                    pending_losses.append(
                        (
                            epoch * batches_per_epoch + epoch_i + j,
                            losses[j],
                            n_filts[j],
                        )
                    )
                    if len(pending_losses) > 8:
                        _write_batch_line(
                            batch_fp, pending_losses.popleft(),
                            high_conf_incorrect_thr_frac,
                        )
                epoch_i += steps_per_launch
                continue
            batch = next(trn_iter)
            if multihost:
                from remora_tpu.parallel.mesh import host_shard_to_global

                global_batch = host_shard_to_global(
                    mesh, {n: batch[n] for n in names}
                )
                step_inputs = tuple(global_batch[n] for n in names)
            elif batch_sharding is not None:
                step_inputs = tuple(
                    jax.device_put(batch[n], batch_sharding) for n in names
                )
            else:
                step_inputs = tuple(jnp.asarray(batch[n]) for n in names)
            params, bn_state, opt_state, loss, n_filt, grad_maxs = train_step(
                params,
                bn_state,
                opt_state,
                *step_inputs,
                *((grad_threshs,) if use_grad_clip else ()),
            )
            n_chunks += batch["labels"].shape[0] * (
                jax.process_count() if multihost else 1
            )
            if use_grad_clip:
                maxs = [float(g) for g in jax.tree_util.tree_leaves(grad_maxs)]
                threshs = rolling_mads.update(maxs)
                if threshs is not None:
                    flat, treedef = jax.tree_util.tree_flatten(params)
                    grad_threshs = jax.tree_util.tree_unflatten(
                        treedef, [jnp.asarray(t) for t in threshs]
                    )
            # fetch loss with a lag so the scalar read does not fence
            # every dispatch — the device stays several steps ahead
            # (grad clipping already fences on grad_maxs above)
            pending_losses.append(
                (epoch * batches_per_epoch + epoch_i, loss, n_filt)
            )
            if len(pending_losses) > 8:
                _write_batch_line(
                    batch_fp, pending_losses.popleft(),
                    high_conf_incorrect_thr_frac,
                )
            epoch_i += 1
        while pending_losses:
            _write_batch_line(
                batch_fp, pending_losses.popleft(),
                high_conf_incorrect_thr_frac,
            )
        dt = time.monotonic() - t0
        if jax_trace_dir is not None and epoch == 0:
            jax.block_until_ready(loss)
            jax.profiler.stop_trace()
            LOGGER.info(f"JAX trace written to {jax_trace_dir}")
        LOGGER.info(
            f"Epoch {epoch + 1}: {n_chunks / dt:,.0f} chunks/s "
            f"({batches_per_epoch} batches in {dt:.1f}s)"
        )

        val_metrics = val_logger.validate_model(
            eval_fn,
            dataset.metadata.mod_bases,
            val_ds,
            filt_frac,
            nepoch=epoch + 1,
            niter=(epoch + 1) * batches_per_epoch,
        )
        trn_metrics = val_logger.validate_model(
            eval_fn,
            dataset.metadata.mod_bases,
            val_trn_ds,
            filt_frac,
            "trn",
            nepoch=epoch + 1,
            niter=(epoch + 1) * batches_per_epoch,
        )
        LOGGER.info(
            f"Epoch {epoch + 1} val_acc {val_metrics.acc:.4f} "
            f"trn_acc {trn_metrics.acc:.4f} val_loss {val_metrics.loss:.6f}"
        )

        if breached:
            if val_metrics.acc <= REGRESSION_THRESHOLD:
                LOGGER.warning("Remora training unstable")
        elif val_metrics.acc >= BREACH_THRESHOLD:
            breached = True
            LOGGER.debug(
                f"{BREACH_THRESHOLD * 100}% accuracy threshold surpassed"
            )

        if val_metrics.acc > best_val_acc:
            best_val_acc = val_metrics.acc
            early_stop_epochs = 0
            save(constants.BEST_MODEL_FILENAME)
        else:
            early_stop_epochs += 1

        for ext_name, ext_ds in ext_datasets:
            ext_ms = val_logger.validate_model(
                eval_fn,
                dataset.metadata.mod_bases,
                ext_ds,
                filt_frac,
                ext_name,
                nepoch=epoch + 1,
                niter=(epoch + 1) * batches_per_epoch,
            )
            if ext_ms.acc > best_alt_val_accs[ext_name]:
                best_alt_val_accs[ext_name] = ext_ms.acc
                early_stop_epochs = 0
                save(f"model_ext_val_{ext_name}_best.checkpoint")

        if (epoch + 1) % save_freq == 0:
            save(f"model_{epoch + 1:06d}.checkpoint")

        if (
            train_opts.early_stopping
            and early_stop_epochs >= train_opts.early_stopping
        ):
            LOGGER.info(
                "No validation accuracy improvement after "
                f"{train_opts.early_stopping} epochs. Training stopped early."
            )
            break

    LOGGER.info("Saving final model checkpoint")
    save(constants.FINAL_MODEL_FILENAME)
    batch_fp.close()
    val_fp.close()
    return best_val_acc
