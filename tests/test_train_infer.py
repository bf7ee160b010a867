"""End-to-end train -> checkpoint -> infer -> validate -> export tests."""

import json
import os

import numpy as np
import pytest

DATA = "/root/reference/tests/data"


# trained_model is a session fixture in conftest.py (shared with the
# DP-inference suite)


@pytest.fixture(scope="session")
def trained_lstm_model(tmpdir_factory, chunks_config):
    from remora_tpu.train.optim import TrainOpts
    from remora_tpu.train.train import train_model

    out = tmpdir_factory.mktemp("train_lstm_out")
    train_model(
        seed=42,
        out_path=str(out),
        remora_dataset_path=str(chunks_config),
        chunk_context=(50, 50),
        kmer_context_bases=(2, 2),
        batch_size=32,
        model_name="ConvLSTM_w_ref",
        size=16,
        train_opts=TrainOpts(epochs=2, early_stopping=0),
        chunks_per_epoch=160,
        num_test_chunks=40,
    )
    return os.path.join(str(out), "model_final.checkpoint")


def test_training_artifacts(trained_model):
    out_dir = os.path.dirname(trained_model)
    assert os.path.exists(trained_model)
    assert os.path.exists(os.path.join(out_dir, "validation.log"))
    assert os.path.exists(os.path.join(out_dir, "batch.log"))
    assert os.path.exists(os.path.join(out_dir, "dataset_config.jsn"))
    with open(os.path.join(out_dir, "validation.log")) as fh:
        lines = fh.read().splitlines()
    assert lines[0].startswith("Val_Type")
    assert any(line.startswith("val\t") for line in lines[1:])


def test_checkpoint_load(trained_model):
    from remora_tpu.models import model_io

    model, params, bn_state, meta = model_io.load_model(trained_model)
    assert meta["chunk_context"] == (50, 50)
    assert meta["motifs"] == [("CG", 0)]
    assert meta["can_base"] == "C"
    assert meta["mod_bases"] == ["m"]
    logits, _ = model.forward(
        params,
        bn_state,
        np.zeros((2, 1, 100), np.float32),
        np.zeros((2, 36, 100), np.float32),
        train=False,
    )
    assert logits.shape == (2, 2)


def test_lstm_training(trained_lstm_model):
    from remora_tpu.models import model_io

    model, params, bn_state, meta = model_io.load_model(trained_lstm_model)
    assert "lstm1" in params
    logits, _ = model.forward(
        params,
        bn_state,
        np.zeros((2, 1, 100), np.float32),
        np.zeros((2, 20, 100), np.float32),
        train=False,
    )
    assert logits.shape == (2, 2)


@pytest.fixture(scope="session")
def inferred_bam(tmpdir_factory, trained_model):
    from remora_tpu.infer.infer import (
        infer_from_pod5_and_bam,
        make_model_eval_fn,
    )
    from remora_tpu.models import model_io

    model, params, bn_state, meta = model_io.load_model(trained_model)
    eval_fn = make_model_eval_fn(model, params, bn_state)
    out = tmpdir_factory.mktemp("infer_out") / "can_infer.bam"
    n = infer_from_pod5_and_bam(
        pod5_path=f"{DATA}/can_reads.pod5",
        in_bam_path=f"{DATA}/can_mappings.bam",
        models=[(eval_fn, meta)],
        out_bam_path=str(out),
        batch_size=128,
    )
    assert n == 14
    return str(out)


def test_bf16_eval_close_to_f32(trained_model):
    """ModelHandle compute_dtype=bf16: logits close to f32, raw path too."""
    import jax.numpy as jnp
    import numpy as np

    from remora_tpu.infer.infer import ModelHandle

    h32 = ModelHandle.load(trained_model)
    h16 = ModelHandle.load(trained_model, compute_dtype=jnp.bfloat16)
    meta = h32.metadata
    W = meta["chunk_len"]
    K = meta["kmer_len"]
    rng = np.random.default_rng(0)
    B = 8
    sigs = rng.normal(size=(B, 1, W)).astype(np.float32)
    enc = (rng.random((B, 4 * K, W)) < 0.25).astype(np.float32)
    l32 = np.asarray(h32.eval_fn(sigs, enc))
    l16 = np.asarray(h16.eval_fn(sigs, enc))
    assert l16.dtype == np.float32
    np.testing.assert_allclose(l16, l32, atol=0.25)
    # argmax calls should agree on confident chunks
    conf = np.abs(l32[:, 0] - l32[:, 1]) > 0.5
    assert (l16.argmax(1)[conf] == l32.argmax(1)[conf]).all()


def test_infer_device_stage_crash_fails_fast(tmpdir_factory, trained_model):
    """A crashed device stage must surface as an error, not a clean exit
    with a truncated BAM (and must not deadlock the pipeline)."""
    import pytest

    from remora_tpu import RemoraError
    from remora_tpu.infer.infer import ModelHandle, infer_from_pod5_and_bam

    h = ModelHandle.load(trained_model)

    def bad_eval(sigs, enc_kmers):
        raise RuntimeError("device exploded")

    out = tmpdir_factory.mktemp("crash_out") / "crash.bam"
    with pytest.raises(RemoraError, match="call_batches.*device exploded"):
        infer_from_pod5_and_bam(
            pod5_path=f"{DATA}/can_reads.pod5",
            in_bam_path=f"{DATA}/can_mappings.bam",
            models=[(bad_eval, h.metadata)],
            out_bam_path=str(out),
            batch_size=128,
        )


def test_infer_device_refine_backend_stage(
    tmpdir_factory, trained_model, inferred_bam
):
    """refine_backend="device" swaps the read-prep stage for the single
    in-process batched worker (prepare_reads_batched); with this model's
    unloaded refiner the refine is a no-op, so the output MM/ML tags
    must be identical to the host-path BAM."""
    from remora_tpu.infer.infer import ModelHandle, infer_from_pod5_and_bam
    from remora_tpu.io.bam import FastBamScanner

    handle = ModelHandle.load(trained_model)
    out = tmpdir_factory.mktemp("infer_dev") / "can_infer_dev.bam"
    n = infer_from_pod5_and_bam(
        pod5_path=f"{DATA}/can_reads.pod5",
        in_bam_path=f"{DATA}/can_mappings.bam",
        models=[handle],
        out_bam_path=str(out),
        batch_size=128,
        refine_backend="device",
    )
    assert n == 14

    def tags_by_read(path):
        return {
            rec.query_name: (rec.get_tag("MM"), tuple(rec.get_tag("ML")))
            for rec in FastBamScanner(path)
        }

    assert tags_by_read(str(out)) == tags_by_read(inferred_bam)


def test_infer_output_tags(inferred_bam):
    from remora_tpu.io.bam import FastBamScanner

    recs = list(FastBamScanner(inferred_bam))
    assert len(recs) == 14
    for rec in recs:
        assert rec.has_tag("MM")
        assert rec.has_tag("ML")
        mm = rec.get_tag("MM")
        assert mm.startswith("C+m?")
        # ML length equals number of MM deltas
        n_deltas = len(mm.rstrip(";").split(",")) - 1
        assert len(rec.get_tag("ML")) == n_deltas


def test_mm_parse_roundtrip(inferred_bam):
    from remora_tpu.io.bam import FastBamScanner

    for rec in FastBamScanner(inferred_bam):
        mb = rec.modified_bases
        assert mb is not None
        ((can_base, strand, mod), calls), *_ = list(mb.items())
        assert mod == "m"
        exp_base = "C" if not rec.is_reverse else "G"
        for qpos, _qual in calls[:10]:
            assert rec.query_sequence[qpos] == exp_base


def test_validate_modbams(tmpdir_factory, inferred_bam):
    from remora_tpu.validate_modbam import validate_modbams

    ms = validate_modbams(
        bams_and_beds=[[inferred_bam, f"{DATA}/can_gt.bed"]],
        full_results_path=None,
        name="test",
        pct_filt=10.0,
        allow_unbalanced=True,
        seed=1,
        extra_bases="m",
    )
    assert ms.num_calls > 100
    assert 0 <= ms.acc <= 1


def test_validate_from_dataset(trained_model, can_chunks):
    import sys

    from remora_tpu.data.dataset import ComposedDataset, CoreDataset
    from remora_tpu.infer.infer import make_model_eval_fn
    from remora_tpu.models import model_io
    from remora_tpu.train.validate import ValidationLogger

    model, params, bn_state, meta = model_io.load_model(trained_model)
    ds = ComposedDataset(
        [
            CoreDataset(
                str(can_chunks),
                override_metadata={
                    "extra_arrays": {},
                    "chunk_context": list(meta["chunk_context"]),
                    "kmer_context_bases": list(meta["kmer_context_bases"]),
                },
                infinite_iter=False,
            )
        ],
        np.ones(1),
        batch_size=64,
    )
    fwd = make_model_eval_fn(model, params, bn_state)

    def eval_fn(sigs, enc_kmers):
        n = sigs.shape[0]
        pad_s = np.zeros((64,) + sigs.shape[1:], sigs.dtype)
        pad_k = np.zeros((64,) + enc_kmers.shape[1:], enc_kmers.dtype)
        pad_s[:n] = sigs
        pad_k[:n] = enc_kmers
        return np.asarray(fwd(pad_s, pad_k))[:n]

    import io as io_mod

    logger = ValidationLogger(io_mod.StringIO())
    ms = logger.run_validation(eval_fn, meta["mod_bases"], ds, 0.1)
    assert ms.num_calls == 205


def test_duplex_infer(tmpdir_factory, trained_model):
    from remora_tpu.infer.duplex_infer import infer_duplex
    from remora_tpu.infer.infer import make_model_eval_fn
    from remora_tpu.io.bam import FastBamScanner
    from remora_tpu.models import model_io

    model, params, bn_state, meta = model_io.load_model(trained_model)
    eval_fn = make_model_eval_fn(model, params, bn_state)
    out = tmpdir_factory.mktemp("duplex_out") / "duplex.bam"
    n = infer_duplex(
        simplex_pod5_path=f"{DATA}/duplex_reads.pod5",
        simplex_bam_path=f"{DATA}/simplex_reads_mapped.bam",
        duplex_bam_path=f"{DATA}/duplex_reads_mapped.bam",
        pairs_path=f"{DATA}/duplex_pairs.txt",
        models=[(eval_fn, meta)],
        out_bam=str(out),
    )
    assert n == 2
    for rec in FastBamScanner(str(out)):
        mm = rec.get_tag("MM")
        assert "C+m?" in mm and "G-m?" in mm


def test_export_roundtrip(tmpdir_factory, trained_model):
    import torch

    from remora_tpu.models import export, model_io

    out_dir = tmpdir_factory.mktemp("export_out")
    ts_path = str(out_dir / "model.pt")
    export.export_model_torchscript(trained_model, ts_path)
    m1, p1, b1, meta1 = model_io.load_model(trained_model)
    m2, p2, b2, meta2 = model_io.load_model(ts_path)
    rng = np.random.default_rng(0)
    sigs = rng.normal(size=(4, 1, 100)).astype(np.float32)
    kmers = (rng.random((4, 36, 100)) < 0.25).astype(np.float32)
    o1, _ = m1.forward(p1, b1, sigs, kmers, train=False)
    o2, _ = m2.forward(p2, b2, sigs, kmers, train=False)
    assert np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    # torch executes the exported torchscript with matching output
    ts = torch.jit.load(ts_path)
    ts.eval()
    with torch.no_grad():
        ot = ts(torch.from_numpy(sigs), torch.from_numpy(kmers)).numpy()
    assert np.allclose(ot, np.asarray(o1), atol=1e-5)
    # dorado export produces tensors + config
    dorado_dir = str(out_dir / "dorado")
    export.export_model_dorado(trained_model, dorado_dir)
    assert os.path.exists(os.path.join(dorado_dir, "config.toml"))
    assert any(f.endswith(".tensor") for f in os.listdir(dorado_dir))


def test_finetune(tmpdir_factory, chunks_config, trained_model):
    from remora_tpu.train.optim import TrainOpts
    from remora_tpu.train.train import train_model

    out = tmpdir_factory.mktemp("finetune_out")
    train_model(
        seed=7,
        out_path=str(out),
        remora_dataset_path=str(chunks_config),
        chunk_context=(50, 50),
        kmer_context_bases=(4, 4),
        batch_size=32,
        model_name="Conv_w_ref",
        size=16,
        train_opts=TrainOpts(epochs=1, early_stopping=0),
        chunks_per_epoch=64,
        num_test_chunks=40,
        finetune_path=trained_model,
    )
    assert os.path.exists(str(out / "model_final.checkpoint"))


def test_ref_anchored_infer(tmpdir_factory, trained_model):
    from remora_tpu.infer.infer import ModelHandle, infer_from_pod5_and_bam
    from remora_tpu.io.bam import FastBamScanner

    handle = ModelHandle.load(trained_model)
    out = tmpdir_factory.mktemp("refanch") / "ra.bam"
    n = infer_from_pod5_and_bam(
        pod5_path=f"{DATA}/can_reads.pod5",
        in_bam_path=f"{DATA}/can_mappings.bam",
        models=[handle],
        out_bam_path=str(out),
        batch_size=128,
        ref_anchored=True,
    )
    assert n == 14
    for rec in FastBamScanner(str(out)):
        # reference-anchored records carry a pure-match cigar over the
        # reference sequence and no quality string
        assert rec.cigartuples is not None and len(rec.cigartuples) == 1
        assert rec.cigartuples[0][0] == 0
        assert len(rec.query_sequence) == rec.cigartuples[0][1]
        assert rec.query_qualities is None
        assert rec.has_tag("MM")


def test_resume_from_checkpoint(tmpdir_factory, chunks_config):
    """Training resumes weights + optimizer state + epoch counter from a
    checkpoint (reference analog: model_util.py continue_from_checkpoint)."""
    import numpy as np

    from remora_tpu.models import model_io
    from remora_tpu.train.optim import TrainOpts
    from remora_tpu.train.train import train_model

    out1 = tmpdir_factory.mktemp("resume") / "round1"
    common = dict(
        seed=7,
        remora_dataset_path=str(chunks_config),
        chunk_context=(50, 50),
        kmer_context_bases=(2, 2),
        batch_size=16,
        model_name="Conv_w_ref",
        size=8,
        train_opts=TrainOpts(epochs=1, early_stopping=0),
        chunks_per_epoch=64,
        num_test_chunks=32,
    )
    train_model(out_path=str(out1), **common)
    ckpt1 = str(out1 / "model_final.checkpoint")
    _m, params1, _bn, meta1 = model_io.load_model(ckpt1)
    assert meta1["epoch"] == 1

    out2 = tmpdir_factory.mktemp("resume") / "round2"
    common["train_opts"] = TrainOpts(epochs=2, early_stopping=0)
    train_model(
        out_path=str(out2), resume_from_checkpoint=ckpt1, **common
    )
    ckpt2 = str(out2 / "model_final.checkpoint")
    _m, params2, _bn, meta2 = model_io.load_model(ckpt2)
    assert meta2["epoch"] == 2
    # parameters actually advanced from the restored point
    diffs = [
        np.abs(np.asarray(a) - np.asarray(b)).max()
        for a, b in zip(
            jax_leaves(params1), jax_leaves(params2)
        )
    ]
    assert max(diffs) > 0


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_train_filtering_and_grad_clip(tmpdir_factory, chunks_config):
    """High-confidence-incorrect batch filtering + rolling-MAD adaptive
    gradient clipping both execute through the jitted train step
    (reference analogs: train_model.py:477-497 and RollingMAD clipping)."""
    from remora_tpu.models import model_io
    from remora_tpu.train.optim import TrainOpts
    from remora_tpu.train.train import train_model

    out = tmpdir_factory.mktemp("filt_clip") / "model"
    train_model(
        seed=11,
        out_path=str(out),
        remora_dataset_path=str(chunks_config),
        chunk_context=(50, 50),
        kmer_context_bases=(2, 2),
        batch_size=16,
        model_name="Conv_w_ref",
        size=8,
        train_opts=TrainOpts(epochs=1, early_stopping=0),
        chunks_per_epoch=64,
        num_test_chunks=32,
        high_conf_incorrect_thr_frac=(0.9, 0.2),
        gradient_clip_num_mads=4,
    )
    _m, _p, _bn, meta = model_io.load_model(
        str(out / "model_final.checkpoint")
    )
    assert meta["epoch"] == 1


def test_cli_validate_from_dataset(trained_model, chunks_config, tmp_path):
    """`validate from_remora_dataset` CLI end-to-end (reference analog:
    test_main.py validate-from-dataset flow)."""
    import subprocess
    import sys

    out_file = tmp_path / "val.tsv"
    res = subprocess.run(
        [
            sys.executable, "-m", "remora_tpu", "validate",
            "from_remora_dataset", str(chunks_config),
            "--model", trained_model,
            "--out-file", str(out_file),
            "--batch-size", "64",
        ],
        env=dict(os.environ, JAX_PLATFORMS="cpu",
                 PYTHONPATH=os.path.dirname(os.path.dirname(
                     os.path.abspath(__file__)))),
        timeout=300, capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    body = out_file.read_text().splitlines()
    assert len(body) >= 2  # header + summary row
    assert "acc" in body[0].lower() or "accuracy" in body[0].lower()


def test_train_bf16_compute(tmpdir_factory, chunks_config):
    """Mixed-precision training (bf16 compute, f32 master weights)
    trains to a usable checkpoint."""
    from remora_tpu.models import model_io
    from remora_tpu.train.optim import TrainOpts
    from remora_tpu.train.train import train_model

    out = tmpdir_factory.mktemp("bf16") / "model"
    train_model(
        seed=3,
        out_path=str(out),
        remora_dataset_path=str(chunks_config),
        chunk_context=(50, 50),
        kmer_context_bases=(2, 2),
        batch_size=16,
        model_name="Conv_w_ref",
        size=8,
        train_opts=TrainOpts(epochs=1, early_stopping=0),
        chunks_per_epoch=64,
        num_test_chunks=32,
        bf16_compute=True,
    )
    import numpy as np

    _m, p, _bn, meta = model_io.load_model(str(out / "model_final.checkpoint"))
    assert meta["epoch"] == 1
    # master weights stayed f32 and finite
    leaves = jax_leaves(p)
    assert all(np.asarray(x).dtype == np.float32 for x in leaves)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_implicit_mod_tag_gate():
    """Implicit ('.') MM tag types are rejected unless the user forces
    validation with explicit_mod_tag_used (reference gate analog)."""
    from remora_tpu.validate_modbam import _has_implicit_mod_tags

    class FakeRead:
        def __init__(self, mm):
            self._mm = mm

        def get_tag(self, name):
            if name == "MM":
                return self._mm
            raise KeyError(name)

    assert not _has_implicit_mod_tags(FakeRead("C+m?,1,3;"))
    assert _has_implicit_mod_tags(FakeRead("C+m.,1,3;"))
    assert _has_implicit_mod_tags(FakeRead("C+m,1,3;"))
    assert _has_implicit_mod_tags(FakeRead("C+m?,1;A+a.,2;"))
