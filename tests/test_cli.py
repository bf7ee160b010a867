"""CLI integration tests via subprocess (reference test_main.py analog)."""

import json
import os
import subprocess
import sys

import pytest

DATA = "/root/reference/tests/data"
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)


def run_cli(*args, timeout=420):
    return subprocess.run(
        [sys.executable, "-m", "remora_tpu", *map(str, args)],
        check=True,
        env=ENV,
        timeout=timeout,
        capture_output=True,
        text=True,
    )


def test_help():
    out = run_cli("--help")
    assert "dataset" in out.stdout


@pytest.fixture(scope="session")
def cli_can_chunks(tmpdir_factory):
    out = tmpdir_factory.mktemp("cli") / "can_chunks"
    run_cli(
        "dataset",
        "prepare",
        f"{DATA}/can_reads.pod5",
        f"{DATA}/can_mappings.bam",
        "--output-path",
        out,
        "--mod-base-control",
        "--motif",
        "CG",
        "0",
    )
    return out


def test_cli_prepare_golden_count(cli_can_chunks):
    from remora_tpu.data.dataset import CoreDataset

    ds = CoreDataset(str(cli_can_chunks))
    assert ds.size == 205


def test_cli_dataset_inspect(cli_can_chunks, tmp_path):
    cfg = tmp_path / "ds.cfg"
    out = run_cli(
        "dataset", "inspect", cli_can_chunks, "--out-path", cfg
    )
    # exact golden: the summary prints "{name:>25} : {val}" per line, so
    # the size row must read exactly "size : 205" once left-stripped
    size_rows = [
        ln.strip()
        for ln in out.stdout.splitlines()
        if ln.strip().startswith("size :")
    ]
    assert size_rows and all(r == "size : 205" for r in size_rows), (
        size_rows or out.stdout
    )
    assert cfg.exists()
    loaded = json.loads(cfg.read_text())
    assert len(loaded) == 1


def test_cli_dataset_head_copy(cli_can_chunks, tmp_path):
    from remora_tpu.data.dataset import CoreDataset

    run_cli("dataset", "head", tmp_path / "head_ds", cli_can_chunks, 20)
    assert CoreDataset(str(tmp_path / "head_ds")).size == 20
    run_cli("dataset", "copy", cli_can_chunks, tmp_path / "copy_ds")
    assert CoreDataset(str(tmp_path / "copy_ds")).size == 205


def test_cli_list_pretrained():
    out = run_cli("model", "list_pretrained", "--pore", "dna_r9.4.1_e8")
    assert "dna_r9.4.1_e8_sup_v3.5.1_5mc_CG_v0" in out.stdout


def test_cli_plot_ref_region(tmp_path):
    out = tmp_path / "reg.svg"
    run_cli(
        "analyze",
        "plot_ref_region",
        "--pod5-and-bam",
        f"{DATA}/can_reads.pod5",
        f"{DATA}/can_mappings.bam",
        "--ref-reg",
        "chr13:52310001-52310100:+",
        "--out-path",
        out,
    )
    assert out.exists() and out.stat().st_size > 10_000


def test_cli_estimate_kmer_levels(tmp_path):
    out = tmp_path / "levels.txt"
    run_cli(
        "analyze",
        "estimate_kmer_levels",
        "--pod5-and-bam",
        f"{DATA}/can_reads.pod5",
        f"{DATA}/can_mappings.bam",
        "--out-path",
        out,
        "--kmer-context-bases",
        "1",
        "1",
        "--min-coverage",
        "3",
        "--chunk-len",
        "2000",
    )
    lines = out.read_text().splitlines()
    assert len(lines) == 64


def test_cli_train_data_parallel(cli_can_chunks, tmp_path):
    """End-to-end `model train --data-parallel` over the 8-device
    virtual mesh (reference CLI analog: parsers.py train runner; the
    mesh path replaces the reference's single-device torch training)."""
    from remora_tpu.data.dataset import CoreDataset

    cfg = tmp_path / "ds.cfg"
    cfg.write_text(json.dumps([[str(cli_can_chunks), 1.0]]))
    out = tmp_path / "dp_train"
    env = dict(ENV, XLA_FLAGS="--xla_force_host_platform_device_count=8")
    res = subprocess.run(
        [
            sys.executable, "-m", "remora_tpu", "model", "train",
            str(cfg), "--output-path", str(out), "--model", "Conv_w_ref",
            "--size", "8", "--batch-size", "16", "--epochs", "1",
            "--chunks-per-epoch", "32", "--num-test-chunks", "16",
            "--early-stopping", "0", "--chunk-context", "50", "50",
            "--data-parallel",
        ],
        check=True, env=env, timeout=420, capture_output=True, text=True,
    )
    assert (out / "model_final.checkpoint").exists()
    log_text = (out / "log.txt").read_text()
    assert "Data-parallel training over 8 devices" in log_text


def test_cli_chebi_end_to_end(cli_can_chunks, tmp_path):
    """ChEBI-coded mod base through prepare -> train -> infer; MM tags
    carry the numeric code (reference analog: test_main.py chebi flow)."""
    from remora_tpu.io.bam import FastBamScanner

    chebi = tmp_path / "chebi_chunks"
    run_cli(
        "dataset", "prepare",
        f"{DATA}/mod_reads.pod5", f"{DATA}/mod_mappings.bam",
        "--output-path", chebi, "--mod-base", "27551", "5mC_chebi",
        "--motif", "CG", "0",
    )
    cfg = tmp_path / "chebi.cfg"
    cfg.write_text(
        json.dumps([[str(cli_can_chunks), 1.0], [str(chebi), 1.0]])
    )
    model_dir = tmp_path / "chebi_model"
    run_cli(
        "model", "train", cfg, "--output-path", model_dir,
        "--model", "Conv_w_ref", "--size", "8", "--batch-size", "16",
        "--epochs", "1", "--chunks-per-epoch", "32",
        "--num-test-chunks", "16", "--early-stopping", "0",
        "--chunk-context", "50", "50",
    )
    out_bam = tmp_path / "chebi_calls.bam"
    run_cli(
        "infer", "from_pod5_and_bam",
        f"{DATA}/mod_reads.pod5", f"{DATA}/mod_mappings.bam",
        "--model", model_dir / "model_final.checkpoint",
        "--out-bam", out_bam,
    )
    n = 0
    for rec in FastBamScanner(str(out_bam)):
        mm = rec.get_tag("MM")
        assert mm.startswith("C+27551?"), mm
        n += 1
    assert n == 14


def test_cli_make_config_and_merge(cli_can_chunks, tmp_path):
    """dataset make_config (hash-verified) + physical merge (reference
    analog: parsers.py dataset merge / make_config runners)."""
    from remora_tpu.data.dataset import ComposedDataset, CoreDataset

    cfg = tmp_path / "weighted.cfg"
    run_cli(
        "dataset", "make_config", cfg,
        "--dataset", cli_can_chunks, "1",
        "--dataset", cli_can_chunks, "2",
    )
    loaded = json.loads(cfg.read_text())
    assert len(loaded) == 2 and len(loaded[0]) == 3  # path, weight, hash
    ds = ComposedDataset.from_config(str(cfg), batch_size=10)
    assert ds.size == 410

    merged_out = tmp_path / "merged"
    run_cli("dataset", "merge", merged_out, cli_can_chunks, cli_can_chunks)
    merged = CoreDataset(str(merged_out))
    assert merged.size == 410
    assert merged.metadata.allocate_size == 410

    capped = tmp_path / "merged_cap"
    run_cli(
        "dataset", "merge", capped, cli_can_chunks, cli_can_chunks,
        "--max-size", "100",
    )
    assert CoreDataset(str(capped)).size == 100


def test_cli_train_dynamic_contexts(cli_can_chunks, tmp_path):
    """Training at shrunken chunk AND kmer contexts relative to the
    stored dataset (reference analog: test_main.py dynamic-context
    trains); the checkpoint must carry the shrunken geometry."""
    from remora_tpu.models import model_io

    cfg = tmp_path / "ds.cfg"
    cfg.write_text(json.dumps([[str(cli_can_chunks), 1.0]]))
    out = tmp_path / "dyn_train"
    run_cli(
        "model", "train", cfg, "--output-path", out,
        "--model", "Conv_w_ref", "--size", "8", "--batch-size", "16",
        "--epochs", "1", "--chunks-per-epoch", "32",
        "--num-test-chunks", "16", "--early-stopping", "0",
        "--chunk-context", "50", "50", "--kmer-context-bases", "2", "2",
    )
    _m, _p, _bn, meta = model_io.load_model(
        str(out / "model_final.checkpoint")
    )
    assert tuple(meta["chunk_context"]) == (50, 50)
    assert tuple(meta["kmer_context_bases"]) == (2, 2)
    assert meta["model_params"]["kmer_len"] == 5


def test_cli_merge_mixed_labels(cli_can_chunks, tmp_path):
    """Physically merging control + modified datasets unions the label
    space and preserves per-label counts."""
    from remora_tpu.data.dataset import CoreDataset

    mod = tmp_path / "mod_chunks"
    run_cli(
        "dataset", "prepare",
        f"{DATA}/mod_reads.pod5", f"{DATA}/mod_mappings.bam",
        "--output-path", mod, "--mod-base", "m", "5mC",
        "--motif", "CG", "0",
    )
    merged = tmp_path / "merged_mixed"
    run_cli("dataset", "merge", merged, cli_can_chunks, mod)
    ds = CoreDataset(str(merged))
    counts = ds.get_label_counts()
    assert ds.metadata.mod_bases == ["m"]
    assert counts[0] == 205 and counts[1] == 210


@pytest.fixture(scope="session")
def cli_model(cli_can_chunks, tmpdir_factory):
    """Tiny ConvLSTM (can + 5mC) trained via the CLI, shared by the
    export/duplex tests."""
    base = tmpdir_factory.mktemp("cli_model")
    mod = base / "mod_chunks"
    run_cli(
        "dataset", "prepare",
        f"{DATA}/mod_reads.pod5", f"{DATA}/mod_mappings.bam",
        "--output-path", mod, "--mod-base", "m", "5mC",
        "--motif", "CG", "0",
    )
    cfg = base / "ds.cfg"
    cfg.write_text(
        json.dumps([[str(cli_can_chunks), 1.0], [str(mod), 1.0]]), "utf-8"
    )
    out = base / "model"
    run_cli(
        "model", "train", cfg, "--output-path", out,
        "--model", "ConvLSTM_w_ref", "--size", "16", "--batch-size", "16",
        "--epochs", "1", "--chunks-per-epoch", "32",
        "--num-test-chunks", "16", "--early-stopping", "0",
        "--chunk-context", "50", "50", "--kmer-context-bases", "2", "2",
    )
    return str(out / "model_final.checkpoint")


def test_cli_model_export_dorado(cli_model, tmp_path):
    out = tmp_path / "dorado_model"
    run_cli("model", "export", cli_model, out)
    files = set(os.listdir(out))
    assert "config.toml" in files
    assert any(f.endswith(".tensor") or f.endswith(".pt") for f in files), files

    ts_out = out.parent / "model_ts.pt"
    run_cli("model", "export", cli_model, ts_out, "--format", "torchscript")
    import torch

    m = torch.jit.load(str(ts_out))
    sig = torch.zeros((4, 1, 100))
    km = torch.zeros((4, 20, 100))
    assert tuple(m(sig, km).shape) == (4, 2)


def test_cli_infer_duplex(cli_model, tmp_path):
    out_bam = tmp_path / "duplex_calls.bam"
    run_cli(
        "infer", "duplex_from_pod5_and_bam",
        f"{DATA}/duplex_reads.pod5",
        f"{DATA}/simplex_reads_mapped.bam",
        f"{DATA}/duplex_reads_mapped.bam",
        f"{DATA}/duplex_pairs.txt",
        "--model", cli_model,
        "--out-bam", out_bam,
    )
    from remora_tpu.io.bam import FastBamScanner

    n_tagged = 0
    for rec in FastBamScanner(str(out_bam)):
        try:
            if rec.get_tag("MM"):
                n_tagged += 1
        except KeyError:
            pass
    assert n_tagged >= 1


def test_cli_validate_from_modbams(cli_model, tmp_path):
    """infer -> validate from_modbams with BED ground truth, end-to-end
    through the CLI (reference analog: test_main.py modbam validation)."""
    can_bam = tmp_path / "can_calls.bam"
    mod_bam = tmp_path / "mod_calls.bam"
    run_cli(
        "infer", "from_pod5_and_bam",
        f"{DATA}/can_reads.pod5", f"{DATA}/can_mappings.bam",
        "--model", cli_model, "--out-bam", can_bam,
    )
    run_cli(
        "infer", "from_pod5_and_bam",
        f"{DATA}/mod_reads.pod5", f"{DATA}/mod_mappings.bam",
        "--model", cli_model, "--out-bam", mod_bam,
    )
    out_file = tmp_path / "modbam_val.txt"
    res = run_cli(
        "validate", "from_modbams",
        "--bam-and-bed", can_bam, f"{DATA}/can_gt.bed",
        "--bam-and-bed", mod_bam, f"{DATA}/mod_gt.bed",
        "--seed", "1", "--out-file", out_file,
    )
    body = out_file.read_text()
    assert "acc" in body.lower() or "sample" in body.lower(), body


def test_cli_plot_ref_regions_bed(tmp_path):
    """Reference-form nested command: analyze plot ref_region over a BED
    (multi-page PDF)."""
    out = tmp_path / "regions.pdf"
    run_cli(
        "analyze", "plot", "ref_region",
        "--pod5-and-bam", f"{DATA}/can_reads.pod5",
        f"{DATA}/can_mappings.bam",
        "--ref-regions", f"{DATA}/ref_regions.bed",
        "--plots-filename", out,
        timeout=420,
    )
    assert out.exists() and out.stat().st_size > 10_000


def test_cli_flag_surface_matches_reference():
    """Every reference CLI option string exists on the corresponding
    remora_tpu subcommand (drop-in compatibility contract)."""
    import argparse
    import sys

    def collect(parser, prefix=""):
        out, opts, pos = {}, set(), []
        for a in parser._actions:
            opts.update(a.option_strings)
            if not a.option_strings and not isinstance(
                a, argparse._SubParsersAction
            ):
                # positional arity ("v" for variadic) — names may differ
                pos.append("v" if a.nargs in ("*", "+") else a.nargs)
            if hasattr(a, "choices") and isinstance(a.choices, dict):
                for name, sub in a.choices.items():
                    out.update(collect(sub, f"{prefix}{name} "))
        out[prefix.strip()] = (opts, pos)
        return out

    sys.path.insert(0, "/root/reference/src")
    try:
        import remora.parsers as rp

        refp = argparse.ArgumentParser(prog="remora")
        sub = refp.add_subparsers()
        for reg in (rp.register_dataset, rp.register_model,
                    rp.register_infer, rp.register_validate,
                    rp.register_analyze):
            reg(sub)
        ref = collect(refp)
    finally:
        sys.path.remove("/root/reference/src")
        for m in [k for k in list(sys.modules) if k.startswith("remora.")
                  or k == "remora"]:
            del sys.modules[m]

    from remora_tpu.cli.main import build_parser

    ours = collect(build_parser())
    gaps = {}
    for key, (ref_opts, ref_pos) in ref.items():
        if not key:
            continue
        if key not in ours:
            gaps[key] = "missing subcommand"
            continue
        our_opts, our_pos = ours[key]
        missing = sorted(s for s in ref_opts - our_opts if s.startswith("--"))
        if missing:
            gaps[key] = missing
        if ref_pos != our_pos:
            gaps[f"{key} (positionals)"] = (ref_pos, our_pos)
    assert not gaps, gaps


def test_cli_device_flag(cli_model, tmp_path):
    """--device cpu routes inference through an explicit device scope."""
    out = tmp_path / "dev_infer.bam"
    run_cli(
        "infer", "from_pod5_and_bam",
        f"{DATA}/can_reads.pod5", f"{DATA}/can_mappings.bam",
        "--model", cli_model, "--device", "cpu",
        "--batch-size", "128", "--out-bam", out,
        timeout=420,
    )
    assert out.exists() and out.stat().st_size > 1000


def test_cli_train_steps_per_launch(cli_can_chunks, tmp_path):
    """`model train --steps-per-launch 3` scans 3 optimizer steps per
    device dispatch (plus a single-step tail) and still writes one
    batch.log row per optimizer step and a loadable checkpoint."""
    from remora_tpu.models import model_io

    cfg = tmp_path / "spl.cfg"
    cfg.write_text(json.dumps([[str(cli_can_chunks), 1.0]]))
    out = tmp_path / "spl_train"
    run_cli(
        "model", "train", cfg, "--output-path", out,
        "--model", "ConvLSTM_w_ref", "--size", "8", "--batch-size", "16",
        "--epochs", "2", "--chunks-per-epoch", "64",
        "--num-test-chunks", "16", "--early-stopping", "0",
        "--chunk-context", "50", "50", "--steps-per-launch", "3",
    )
    # 64/16 = 4 batches/epoch x 2 epochs = 8 rows (+ header)
    rows = (out / "batch.log").read_text().strip().splitlines()
    assert len(rows) == 9, rows
    iters = [int(r.split("\t")[0]) for r in rows[1:]]
    assert iters == list(range(8))
    model_io.load_model(str(out / "model_final.checkpoint"))
