"""Functional coverage for scripts/ (reference analog: the repository's
operational scripts, ``/root/reference/scripts``)."""

import json
import os
import py_compile
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SCRIPTS = os.path.join(REPO, "scripts")
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    PYTHONPATH=os.pathsep.join(
        p for p in (REPO, os.environ.get("PYTHONPATH")) if p
    ),
)


def _run(args, **kw):
    return subprocess.run(
        [sys.executable, *args],
        capture_output=True,
        text=True,
        env=ENV,
        **kw,
    )


@pytest.mark.parametrize(
    "script",
    [
        "average_models.py",
        "collapse_label.py",
        "convert_to_guppy_json.py",
        "model_comparison.py",
        "plot_map_refine.py",
        "plot_results.py",
        "update_dataset.py",
    ],
)
def test_script_help(script):
    out = _run([os.path.join(SCRIPTS, script), "--help"])
    assert out.returncode == 0, out.stderr
    assert "usage" in out.stdout.lower()


def test_api_example_compiles():
    # module-level demo (loads a hard-coded checkpoint path); validate
    # it stays syntactically sound without executing it
    py_compile.compile(
        os.path.join(SCRIPTS, "api_example.py"), doraise=True
    )


def test_convert_to_guppy_json(trained_model, tmp_path):
    out_json = tmp_path / "model.jsn"
    res = _run(
        [
            os.path.join(SCRIPTS, "convert_to_guppy_json.py"),
            str(trained_model),
            str(out_json),
        ]
    )
    assert res.returncode == 0, res.stderr
    with open(out_json) as fh:
        payload = json.load(fh)
    assert "model_metadata" in payload and "layers" in payload
    # every exported layer carries weight blobs (fused conv+BN for the
    # conv layers, the four LSTM tensors for lstm layers)
    for name, entry in payload["layers"].items():
        assert entry, name
        key = "w_ih" if name.startswith("lstm") else "weight"
        assert key in entry, (name, sorted(entry))


def test_average_models_identity(trained_model, tmp_path):
    """Averaging a checkpoint with itself reproduces its parameters."""
    out_ckpt = tmp_path / "avg.checkpoint"
    res = _run(
        [
            os.path.join(SCRIPTS, "average_models.py"),
            str(trained_model),
            str(trained_model),
            "--out-path",
            str(out_ckpt),
        ]
    )
    assert res.returncode == 0, res.stderr

    from remora_tpu.models import model_io

    _m, p0, bn0, _md = model_io.load_model(str(trained_model))
    _m, p1, bn1, _md = model_io.load_model(str(out_ckpt))
    for a, b in zip(
        __import__("jax").tree_util.tree_leaves((p0, bn0)),
        __import__("jax").tree_util.tree_leaves((p1, bn1)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_plot_results(trained_model, tmp_path):
    train_dir = os.path.dirname(str(trained_model))
    out = tmp_path / "results.png"
    res = _run(
        [
            os.path.join(SCRIPTS, "plot_results.py"),
            train_dir,
            "--out-path",
            str(out),
        ]
    )
    assert res.returncode == 0, res.stderr
    assert out.exists() and out.stat().st_size > 1000


def test_update_dataset_roundtrip(can_chunks, tmp_path):
    """v3 arrays exported as a legacy npz migrate back bit-identical."""
    from remora_tpu.data.dataset import CoreDataset

    src = CoreDataset(str(can_chunks))
    n = src.size
    arrs = {}
    for name, dtype, shape in src.arrays_info:
        mm = np.memmap(src.get_array_path(name), mode="r", dtype=dtype)
        arrs[name] = np.asarray(mm.reshape(shape)[:n])

    legacy = tmp_path / "remora_train_data.npz"
    md = src.metadata
    np.savez(
        legacy,
        sigs=arrs["signal"][:, 0, :],
        seqs=arrs["sequence"],
        seq_mappings=arrs["sequence_to_signal_mapping"],
        seq_lens=arrs["sequence_lengths"],
        labels=arrs["labels"],
        mod_bases=np.asarray(list(md.mod_bases)),
        mod_long_names=np.asarray(list(md.mod_long_names)),
        motifs=np.asarray(
            [(s, str(o)) for s, o in zip(md.motif_sequences,
                                         md.motif_offsets)]
        ),
        chunk_context=np.asarray(md.chunk_context),
        kmer_context_bases=np.asarray(md.kmer_context_bases),
    )

    out_ds = tmp_path / "migrated"
    res = _run(
        [
            os.path.join(SCRIPTS, "update_dataset.py"),
            str(legacy),
            str(out_ds),
        ]
    )
    assert res.returncode == 0, res.stderr
    dst = CoreDataset(str(out_ds))
    assert dst.size == n
    for name, dtype, shape in dst.arrays_info:
        if name not in arrs:
            continue
        mm = np.memmap(dst.get_array_path(name), mode="r", dtype=dtype)
        got = np.asarray(mm.reshape(shape)[:n])
        np.testing.assert_array_equal(got, arrs[name], err_msg=name)


def test_collapse_label_renormalizes(tmp_path):
    """collapse_label drops one mod code and renormalizes the remaining
    probabilities exactly (native BAM codec end to end)."""
    from remora_tpu.core.tags import format_mm_ml_tags
    from remora_tpu.io.bam import (
        BamHeader,
        BamRecord,
        BamWriter,
        FastBamScanner,
    )

    header = BamHeader(
        text="@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:ctg1\tLN:1000\n",
        references=["ctg1"],
        lengths=[1000],
    )
    seq = "AACGTCCGTA"  # Cs at read positions 2, 5, 6
    poss = [2, 5, 6]
    probs = np.array(
        [[0.50, 0.25], [0.10, 0.80], [0.00, 0.00]]  # (m, h) per call
    )
    mm, ml = format_mm_ml_tags(seq, poss, probs, "mh", "C")
    rec = BamRecord(
        query_name="read1",
        flag=0,
        reference_id=0,
        reference_start=10,
        mapq=60,
        cigartuples=[(0, len(seq))],
        query_sequence=seq,
        query_qualities=np.full(len(seq), 30, dtype=np.uint8),
        tags=[
            ("MM", "Z", mm),
            ("ML", "BC", np.frombuffer(ml.tobytes(), dtype=np.uint8)),
        ],
    )
    in_bam = tmp_path / "in.bam"
    with BamWriter(str(in_bam), header) as w:
        w.write(rec)

    out_bam = tmp_path / "out.bam"
    res = _run(
        [
            os.path.join(SCRIPTS, "collapse_label.py"),
            str(in_bam),
            str(out_bam),
            "--alphabet",
            "Cmh",
            "--drop-mod",
            "h",
        ]
    )
    assert res.returncode == 0, res.stderr

    (read,) = list(FastBamScanner(str(out_bam)))
    mb = read.modified_bases
    assert mb is not None
    ((key, values),) = [
        (k, v) for k, v in mb.items() if k[2] == "m"
    ]
    got = {pos: (prob + 0.5) / 256 for pos, prob in values}
    # script math: q_mod_probs reads bytes back as (b + 0.5)/256, then
    # renormalizes [1 - pm - ph, pm] and emits the mod tail
    for pos, (pm, ph) in zip(poss, probs):
        pm_q = (np.floor(pm * 256).clip(0, 255) + 0.5) / 256
        ph_q = (np.floor(ph * 256).clip(0, 255) + 0.5) / 256
        want = pm_q / (1 - ph_q)
        want_q = (np.floor(want * 256).clip(0, 255) + 0.5) / 256
        assert abs(got[pos] - want_q) < 1e-6, (pos, got[pos], want_q)
    # the h track is gone
    assert not any(k[2] == "h" for k in mb)


def test_model_comparison(trained_model, chunks_config):
    """model_comparison prints one metrics row per model."""
    res = _run(
        [
            os.path.join(SCRIPTS, "model_comparison.py"),
            str(chunks_config),
            "--models",
            str(trained_model),
            str(trained_model),
            "--batch-size",
            "64",
        ]
    )
    assert res.returncode == 0, res.stderr
    lines = [
        ln for ln in res.stdout.splitlines() if ln.strip()
    ]
    assert lines[0].startswith("model\t")
    rows = [ln for ln in lines[1:] if str(trained_model) in ln]
    assert len(rows) == 2
    # identical models must report identical metrics
    assert rows[0].split("\t")[1:] == rows[1].split("\t")[1:]


def test_plot_map_refine(levels_table, tmp_path):
    """plot_map_refine renders the banded-DP visualization for a real
    bundled read."""
    out = tmp_path / "map_refine.png"
    res = _run(
        [
            os.path.join(SCRIPTS, "plot_map_refine.py"),
            "/root/reference/tests/data/can_reads.pod5",
            "/root/reference/tests/data/can_mappings.bam",
            "--levels",
            str(levels_table),
            "--num-bases",
            "30",
            "--out-path",
            str(out),
        ]
    )
    assert res.returncode == 0, res.stderr
    assert out.exists() and out.stat().st_size > 5000
