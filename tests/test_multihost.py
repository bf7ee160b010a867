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


def test_dp_step_single_fused_collective():
    """The DP train step reduces grads + BN stats + loss + filtered
    count in ONE all-reduce (collective launches, not bytes, dominate
    small-model DP steps over DCN/gloo)."""
    import jax
    import numpy as np
    import optax

    from remora_tpu.models.registry import get_model
    from remora_tpu.parallel import mesh as M

    model = get_model("Conv_w_ref")
    params, bn = model.init(
        jax.random.PRNGKey(0), size=8, kmer_len=9, num_out=2
    )
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    mesh = M.make_mesh()
    step = M.make_dp_train_step(model, tx, mesh)
    dsh = M.data_sharding(mesh)
    rng = np.random.default_rng(0)
    B, W = 16, 100
    args = [
        jax.device_put(x, dsh)
        for x in (
            rng.normal(size=(B, 1, W)).astype(np.float32),
            rng.normal(size=(B, 36, W)).astype(np.float32),
            rng.integers(0, 2, B),
        )
    ]
    p, b, o = (M.replicate(mesh, t) for t in (params, bn, opt))
    hlo = step.lower(p, b, o, *args).compile().as_text()
    assert hlo.count("all-reduce") == 1, hlo.count("all-reduce")

    # the step still trains: loss decreases over a few identical batches
    p2, b2, o2, loss0, _nf, _gm = step(p, b, o, *args)
    for _ in range(3):
        p2, b2, o2, loss, _nf, _gm = step(p2, b2, o2, *args)
    assert float(loss) < float(loss0)


def test_dp_step_sync_bn():
    """sync_bn=True: global-batch BN via jit shardings — trains, and its
    loss matches an unsharded single-device step exactly."""
    import jax
    import numpy as np
    import optax

    from remora_tpu.models.registry import get_model
    from remora_tpu.parallel import mesh as M
    from remora_tpu.train.train import make_train_step

    model = get_model("Conv_w_ref")
    tx = optax.adamw(1e-3)
    mesh = M.make_mesh()
    dsh = M.data_sharding(mesh)
    rng = np.random.default_rng(2)
    B, W = 16, 100
    sigs = rng.normal(size=(B, 1, W)).astype(np.float32)
    kmers = rng.normal(size=(B, 36, W)).astype(np.float32)
    labels = rng.integers(0, 2, B)

    params, bn = model.init(
        jax.random.PRNGKey(0), size=8, kmer_len=9, num_out=2
    )
    single = make_train_step(model, tx, donate=False)
    _, _, _, loss_ref, _, _ = single(
        params, bn, tx.init(params), sigs, kmers, labels
    )

    step = M.make_dp_train_step(model, tx, mesh, sync_bn=True)
    p, b_, o = (M.replicate(mesh, t) for t in (params, bn, tx.init(params)))
    data = [jax.device_put(x, dsh) for x in (sigs, kmers, labels)]
    p, b_, o, loss, _nf, _gm = step(p, b_, o, *data)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)


def test_dp_step_grad_clip():
    """Grad-clip support in the fused DP step: maxima come back from the
    reduced grads (no extra collective) and thresholds clip the update."""
    import jax
    import numpy as np
    import optax

    from remora_tpu.models.registry import get_model
    from remora_tpu.parallel import mesh as M

    model = get_model("Conv_w_ref")
    tx = optax.adamw(1e-3)
    mesh = M.make_mesh()
    dsh = M.data_sharding(mesh)
    rng = np.random.default_rng(1)
    B, W = 16, 100
    data = [
        jax.device_put(x, dsh)
        for x in (
            rng.normal(size=(B, 1, W)).astype(np.float32),
            rng.normal(size=(B, 36, W)).astype(np.float32),
            rng.integers(0, 2, B),
        )
    ]
    step = M.make_dp_train_step(model, tx, mesh, use_grad_clip=True)
    params, bn = model.init(
        jax.random.PRNGKey(0), size=8, kmer_len=9, num_out=2
    )
    p, b_, o = (M.replicate(mesh, t) for t in (params, bn, tx.init(params)))
    hlo = step.lower(p, b_, o, *data, None).compile().as_text()
    assert hlo.count("all-reduce") == 1  # maxima need no extra collective
    p, b_, o, loss, _nf, gm = step(p, b_, o, *data, None)
    maxs = jax.tree.leaves(gm)
    assert maxs and all(float(m) > 0 for m in maxs)
    # clip at half of each observed max and step again
    threshs = jax.tree.map(lambda m: m * 0.5, gm)
    p, b_, o, loss2, _nf, gm2 = step(p, b_, o, *data, threshs)
    assert np.isfinite(float(loss2))
    for m2, t in zip(jax.tree.leaves(gm2), jax.tree.leaves(threshs)):
        assert float(m2) >= 0.0  # maxima are pre-clip, just finite-check


def test_dp_step_raw_featurization_matches_host():
    """The DP step's on-device featurization (featurize_args) produces
    the same update as feeding host-computed features."""
    import jax
    import numpy as np
    import optax

    from remora_tpu.data.encoded_kmers import (
        compute_encoded_kmer_batch as host_enc,
    )
    from remora_tpu.models.registry import get_model
    from remora_tpu.parallel import mesh as M

    model = get_model("Conv_w_ref")
    B, W, K, S = 16, 100, 9, 20
    tx = optax.adamw(1e-3)
    mesh = M.make_mesh()
    dsh = M.data_sharding(mesh)

    rng = np.random.default_rng(3)
    signal = rng.normal(size=(B, 1, W)).astype(np.float32)
    seq_lens = rng.integers(S // 2, S + 1, B).astype(np.int16)
    seqs = rng.integers(0, 4, (B, S + K - 1)).astype(np.int8)
    maps = np.zeros((B, S + 1), np.int16)
    for b in range(B):
        sl = seq_lens[b]
        maps[b, 1:sl] = np.sort(rng.integers(0, W + 1, sl - 1))
        maps[b, sl] = W
    labels = rng.integers(0, 2, B)
    enc = host_enc(4, 4, seqs, maps, seq_lens).astype(np.float32)

    outs = []
    for featurize in (False, True):
        step = M.make_dp_train_step(
            model, tx, mesh,
            featurize_args=(((4, 4), W) if featurize else None),
        )
        # fresh state per leg: the donated replicated buffers alias the
        # originals on single-process CPU, so they cannot be reused
        params, bn = model.init(
            jax.random.PRNGKey(0), size=8, kmer_len=K, num_out=2
        )
        p, b_, o = (
            M.replicate(mesh, t) for t in (params, bn, tx.init(params))
        )
        if featurize:
            data = [signal, seqs, maps, seq_lens, labels]
        else:
            data = [signal, enc, labels]
        data = [jax.device_put(x, dsh) for x in data]
        p, b_, o, loss, _nf, _gm = step(p, b_, o, *data)
        outs.append((float(loss), p))
    assert np.isclose(outs[0][0], outs[1][0], rtol=1e-6)
    for a, c in zip(
        jax.tree.leaves(outs[0][1]), jax.tree.leaves(outs[1][1])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6
        )


def test_dp_step_option_combinations():
    """The least-covered DP-step option corners compile and run: raw
    featurization combined with the filter, and sync_bn with raw + grad
    clipping (every flag reaches a different jit signature)."""
    import jax
    import numpy as np
    import optax

    from remora_tpu.models.registry import get_model
    from remora_tpu.parallel import mesh as M

    model = get_model("Conv_w_ref")
    tx = optax.adamw(1e-3)
    mesh = M.make_mesh()
    dsh = M.data_sharding(mesh)
    B, W, K, S = 16, 100, 9, 20
    rng = np.random.default_rng(0)
    signal = rng.normal(size=(B, 1, W)).astype(np.float32)
    seq_lens = rng.integers(S // 2, S + 1, B).astype(np.int16)
    seqs = rng.integers(0, 4, (B, S + K - 1)).astype(np.int8)
    maps = np.zeros((B, S + 1), np.int16)
    for b in range(B):
        sl = seq_lens[b]
        maps[b, 1:sl] = np.sort(rng.integers(0, W + 1, sl - 1))
        maps[b, sl] = W
    labels = rng.integers(0, 2, B)
    data = [signal, seqs, maps, seq_lens, labels]

    for sync, clip, hc in (
        (False, False, (0.9, 0.1)),
        (True, True, (0.9, 0.1)),
    ):
        params, bn = model.init(
            jax.random.PRNGKey(0), size=8, kmer_len=K, num_out=2
        )
        step = M.make_dp_train_step(
            model, tx, mesh, sync_bn=sync, use_grad_clip=clip,
            high_conf_incorrect_thr_frac=hc,
            featurize_args=((4, 4), W),
        )
        p, b_, o = (
            M.replicate(mesh, t) for t in (params, bn, tx.init(params))
        )
        d = [jax.device_put(x, dsh) for x in data]
        extra = (None,) if clip else ()
        p, b_, o, loss, _nf, _gm = step(p, b_, o, *d, *extra)
        assert np.isfinite(float(loss)), (sync, clip, hc)


def test_sharded_input_matches_single_process(can_chunks):
    """Distinct-shard DP training across 2 processes equals single-process
    training on the concatenated per-shard batches (the multihost input
    pipeline correctness contract, SURVEY §2.3)."""
    port = _free_port()
    worker = os.path.join(
        os.path.dirname(__file__), "_dist_shard_worker.py"
    )
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_NUM_CPU_DEVICES="4",
    )
    nsteps = 4
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), str(can_chunks),
             str(nsteps)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    dist_checksums = {}
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-2000:]
        for line in out.splitlines():
            if line.startswith("DIST_RESULT"):
                kv = dict(f.split("=") for f in line.split()[1:])
                dist_checksums[int(kv["pid"])] = float(kv["checksum"])
    assert set(dist_checksums) == {0, 1}
    assert dist_checksums[0] == dist_checksums[1]

    # single-process reference: same shards drawn in-process, batches
    # concatenated in process order, trained on the 8-device virtual mesh
    import numpy as np
    import optax

    import jax

    from remora_tpu.data.dataset import (
        ComposedDataset,
        CoreDataset,
        shard_for_process,
    )
    from remora_tpu.models.registry import get_model
    from remora_tpu.parallel import mesh as M

    shards = []
    for shard_idx in range(2):
        ds = ComposedDataset(
            [
                CoreDataset(
                    str(can_chunks),
                    override_metadata={"chunk_context": (50, 50)},
                )
            ],
            np.ones(1),
            batch_size=16,
            super_batch_size=64,
        )
        shard_for_process(ds, shard_idx, 2)
        shards.append(ds.iter_batches())

    model = get_model("Conv_w_ref")
    ds_meta = ComposedDataset(
        [
            CoreDataset(
                str(can_chunks),
                override_metadata={"chunk_context": (50, 50)},
            )
        ],
        np.ones(1),
    ).metadata
    params, bn = model.init(
        jax.random.PRNGKey(0), size=8, kmer_len=ds_meta.kmer_len,
        num_out=ds_meta.num_labels,
    )
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    mesh = M.make_mesh()
    step = M.make_dp_train_step(model, tx, mesh)
    params = M.replicate(mesh, params)
    bn = M.replicate(mesh, bn)
    opt = M.replicate(mesh, opt)
    dsh = M.data_sharding(mesh)
    for _ in range(nsteps):
        halves = [next(it) for it in shards]
        sigs = np.concatenate([h["signal"] for h in halves]).astype(
            np.float32
        )
        kmers = np.concatenate([h["enc_kmers"] for h in halves]).astype(
            np.float32
        )
        labels = np.concatenate([h["labels"] for h in halves])
        params, bn, opt, loss, _nf, _gm = step(
            params,
            bn,
            opt,
            jax.device_put(sigs, dsh),
            jax.device_put(kmers, dsh),
            jax.device_put(labels, dsh),
        )
    single_checksum = float(
        sum(
            np.abs(np.asarray(x)).sum()
            for x in jax.tree_util.tree_leaves(params)
        )
    )
    assert abs(single_checksum - dist_checksums[0]) < 1e-4 * max(
        1.0, abs(single_checksum)
    ), (single_checksum, dist_checksums)


def test_sharded_eval_fn_matches_single_device():
    """make_dp_eval_fn over the 8-device mesh matches the single-device
    eval step to within a few ulp, including ragged batches.

    Row math is identical, but XLA's codegen (vector blocking, reduction
    tiling) may differ between the full-batch and per-shard shapes, so
    exact bit-equality across DIFFERENT shapes is not an XLA guarantee —
    the cross-PROCESS bit-identity contract is covered by
    test_two_process_sharded_validation_bit_identical."""
    import jax
    import numpy as np

    from remora_tpu.models.registry import get_model
    from remora_tpu.parallel import mesh as M
    from remora_tpu.train.train import make_eval_step

    model = get_model("Conv_w_ref")
    params, bn = model.init(jax.random.PRNGKey(7), size=8, kmer_len=3)
    single_step = make_eval_step(model)
    mesh = M.make_mesh()
    r_params = M.replicate(mesh, params)
    r_bn = M.replicate(mesh, bn)
    eval_fn = M.make_dp_eval_fn(model, mesh)
    rng = np.random.default_rng(11)
    for n_rows in (32, 37):  # divisible and ragged
        sigs = rng.standard_normal((n_rows, 1, 100)).astype(np.float32)
        kmers = rng.standard_normal((n_rows, 12, 100)).astype(np.float32)
        base = np.asarray(single_step(params, bn, sigs, kmers))
        sharded = eval_fn(r_params, r_bn, sigs, kmers)
        assert sharded.shape == (n_rows, 2)
        np.testing.assert_array_almost_equal_nulp(base, sharded, nulp=4)


def test_two_process_sharded_validation_bit_identical(tmp_path):
    """Multi-host validation: each process computes 1/2 of every eval
    batch; the gathered logits on BOTH processes are byte-identical
    (so every process writes the same validation.log) and match a
    single-device evaluation of the same batches to within a few ulp
    (XLA codegen varies with shard shape; the per-row math does not)."""
    import numpy as np

    port = _free_port()
    worker = os.path.join(
        os.path.dirname(__file__), "_dist_eval_worker.py"
    )
    dump = str(tmp_path / "eval_logits")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_NUM_CPU_DEVICES="4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), dump],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    digests = {}
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
        for line in out.splitlines():
            if line.startswith("EVAL_RESULT"):
                kv = dict(f.split("=") for f in line.split()[1:])
                digests[int(kv["pid"])] = kv["digests"]
    assert set(digests) == {0, 1}, outs
    # the multihost-consistency contract: identical logits bytes on
    # every process => identical validation.log everywhere
    assert digests[0] == digests[1]

    # numeric equivalence against a single-device evaluation
    import jax

    from remora_tpu.models.registry import get_model
    from remora_tpu.train.train import make_eval_step

    model = get_model("Conv_w_ref")
    params, bn = model.init(jax.random.PRNGKey(7), size=8, kmer_len=3)
    step = make_eval_step(model)
    rng = np.random.default_rng(11)
    worker_logits = np.load(f"{dump}.pid0.npz")
    for n_rows in (32, 37):
        sigs = rng.standard_normal((n_rows, 1, 100)).astype(np.float32)
        kmers = rng.standard_normal((n_rows, 12, 100)).astype(np.float32)
        base = np.asarray(step(params, bn, sigs, kmers))
        np.testing.assert_array_almost_equal_nulp(
            base, worker_logits[f"logits_{n_rows}"], nulp=8
        )
