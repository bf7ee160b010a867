import json
import os
import sys
from pathlib import Path

import pytest

# force CPU with a virtual 8-device mesh for sharding tests; must be set
# before jax backend init anywhere in the test session (note: the axon
# TPU plugin ignores the JAX_PLATFORMS env var, so also set the config).
# REMORA_TPU_HW_TESTS=1 keeps the real accelerator visible instead — use
# with `-m tpu` to run the hardware parity suite (test_tpu_hardware.py)
if not os.environ.get("REMORA_TPU_HW_TESTS"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

DATA_DIR = Path("/root/reference/tests/data")

EXPECTED_CAN_SIZE = 205
EXPECTED_MOD_SIZE = 210


@pytest.fixture(scope="session")
def can_pod5():
    return DATA_DIR / "can_reads.pod5"


@pytest.fixture(scope="session")
def can_mappings():
    return DATA_DIR / "can_mappings.bam"


@pytest.fixture(scope="session")
def mod_pod5():
    return DATA_DIR / "mod_reads.pod5"


@pytest.fixture(scope="session")
def mod_mappings():
    return DATA_DIR / "mod_mappings.bam"


def _prepare(pod5, bam, out, control):
    from remora_tpu.core.seq import Motif
    from remora_tpu.prepare import extract_chunk_dataset
    from remora_tpu.refine.refiner import SigMapRefiner

    return extract_chunk_dataset(
        bam_path=str(bam),
        pod5_path=str(pod5),
        out_path=str(out),
        mod_base=None if control else ("m", "5mC"),
        mod_base_control=control,
        motifs=[Motif("CG", 0)],
        focus_ref_pos=None,
        chunk_context=(200, 200),
        min_samps_per_base=5,
        max_chunks_per_read=15,
        pa_scaling=None,
        sig_map_refiner=SigMapRefiner(),
        kmer_context_bases=(4, 4),
        base_start_justify=False,
        offset=0,
        num_reads=None,
    )


@pytest.fixture(scope="session")
def can_chunks(tmpdir_factory, can_pod5, can_mappings):
    out = tmpdir_factory.mktemp("remora_tpu_tests") / "can_chunks"
    _prepare(can_pod5, can_mappings, out, control=True)
    return out


@pytest.fixture(scope="session")
def mod_chunks(tmpdir_factory, mod_pod5, mod_mappings):
    out = tmpdir_factory.mktemp("remora_tpu_tests") / "mod_chunks"
    _prepare(mod_pod5, mod_mappings, out, control=False)
    return out


@pytest.fixture(scope="session")
def chunks_config(tmpdir_factory, can_chunks, mod_chunks):
    cfg = tmpdir_factory.mktemp("remora_tpu_tests") / "chunks.cfg"
    with open(cfg, "w") as fh:
        json.dump([[str(can_chunks), 0.5], [str(mod_chunks), 0.5]], fh)
    return cfg


@pytest.fixture(scope="session")
def trained_model(tmpdir_factory, chunks_config):
    """Tiny Conv checkpoint trained on the bundled reads (shared by the
    infer/export/validate suites)."""
    from remora_tpu.train.optim import TrainOpts
    from remora_tpu.train.train import train_model

    out = tmpdir_factory.mktemp("train_out")
    train_model(
        seed=42,
        out_path=str(out),
        remora_dataset_path=str(chunks_config),
        chunk_context=(50, 50),
        kmer_context_bases=(4, 4),
        batch_size=32,
        model_name="Conv_w_ref",
        size=16,
        train_opts=TrainOpts(epochs=3, early_stopping=0),
        chunks_per_epoch=320,
        num_test_chunks=40,
    )
    return os.path.join(str(out), "model_final.checkpoint")


@pytest.fixture(scope="session")
def levels_table(tmpdir_factory):
    """3-mer expected-level table estimated from the bundled reads
    (shared by the refine-ETL and drift-characterization suites)."""
    from remora_tpu.analyze.kmer_levels import estimate_kmer_levels

    out = tmpdir_factory.mktemp("levels") / "levels.txt"
    estimate_kmer_levels(
        pod5_and_bams=[
            (str(DATA_DIR / "can_reads.pod5"),
             str(DATA_DIR / "can_mappings.bam"))
        ],
        out_path=str(out),
        kmer_context_bases=(1, 1),
        min_coverage=3,
        chunk_len=2000,
        max_chunk_coverage=50,
        num_workers=2,
    )
    return str(out)
