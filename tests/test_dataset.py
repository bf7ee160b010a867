"""ETL + dataset layer tests (golden counts, format round-trip)."""

import numpy as np
import pytest

from tests.conftest import EXPECTED_CAN_SIZE, EXPECTED_MOD_SIZE

from remora_tpu.data.dataset import ComposedDataset, CoreDataset


def test_prep_can(can_chunks):
    ds = CoreDataset(str(can_chunks), batch_size=10)
    assert ds.size == EXPECTED_CAN_SIZE
    assert ds.get_label_counts()[0] == EXPECTED_CAN_SIZE


def test_prep_mod(mod_chunks):
    ds = CoreDataset(str(mod_chunks), batch_size=10)
    assert ds.size == EXPECTED_MOD_SIZE
    assert ds.get_label_counts()[1] == EXPECTED_MOD_SIZE


def test_composed_dataset(chunks_config):
    ds = ComposedDataset.from_config(str(chunks_config), batch_size=10)
    counts = ds.get_label_counts()
    assert counts.size == 2
    assert ds.size == EXPECTED_CAN_SIZE + EXPECTED_MOD_SIZE
    assert counts[0] == EXPECTED_CAN_SIZE
    assert counts[1] == EXPECTED_MOD_SIZE
    batch = next(iter(ds))
    assert batch["signal"].shape == (10, 1, 400)
    assert batch["enc_kmers"].shape == (10, 36, 400)
    assert batch["labels"].shape == (10,)
    # mixture should include both labels over a few batches
    it = iter(ds)
    labs = np.concatenate([next(it)["labels"] for _ in range(5)])
    assert set(np.unique(labs)) == {0, 1}


def test_batch_determinism(can_chunks):
    ds1 = CoreDataset(str(can_chunks), batch_size=16)
    ds2 = CoreDataset(str(can_chunks), batch_size=16)
    b1 = next(iter(ds1))
    b2 = next(iter(ds2))
    for k in ("signal", "enc_kmers", "labels"):
        assert np.array_equal(b1[k], b2[k])


def test_context_shrink(can_chunks):
    ds = CoreDataset(
        str(can_chunks),
        batch_size=8,
        override_metadata={
            "chunk_context": (50, 50),
            "kmer_context_bases": (2, 2),
        },
    )
    b = next(iter(ds))
    assert b["signal"].shape == (8, 1, 100)
    assert b["enc_kmers"].shape == (8, 20, 100)
    # mapping invariants survive the trim
    raw = next(ds.iter_batches(raw=True))
    sl = raw["sequence_lengths"]
    sm = raw["sequence_to_signal_mapping"]
    for i in range(sl.size):
        assert sm[i, 0] == 0
        assert sm[i, sl[i]] == 100
        assert np.all(np.diff(sm[i, : sl[i] + 1]) >= 0)


def test_train_test_split(chunks_config):
    ds = ComposedDataset.from_config(str(chunks_config), batch_size=10)
    trn, val = ds.train_test_split(40)
    assert val.size == 40
    assert trn.size == ds.size - 40
    head = trn.head(20)
    assert head.size == 20
    # finite iteration over the validation set terminates
    n = sum(b["labels"].shape[0] for b in val.iter_batches())
    assert n == 40


def test_hash_stability(can_chunks):
    h1 = CoreDataset.hash(str(can_chunks))
    h2 = CoreDataset.hash(str(can_chunks))
    assert h1 == h2 and len(h1) == 64


def test_write_chunk_overflow(tmp_path):
    from remora_tpu.data.metadata import DatasetMetadata
    from remora_tpu.data.read import RemoraRead

    md = DatasetMetadata(
        allocate_size=2,
        max_seq_len=10,
        mod_bases=[],
        mod_long_names=[],
        motif_sequences=["C"],
        motif_offsets=[0],
        chunk_context=(10, 10),
        kmer_context_bases=(1, 1),
    )
    ds = CoreDataset(data_path=str(tmp_path / "ds"), mode="w", metadata=md)
    read = RemoraRead.test_read(nbases=30, signal_per_base=4)
    read.focus_bases = np.array([10, 12, 14])
    chunks = list(read.iter_chunks((10, 10), (1, 1)))
    ds.write_chunk(chunks[0])
    ds.write_chunk(chunks[1])
    from remora_tpu import RemoraError

    with pytest.raises(RemoraError):
        ds.write_chunk(chunks[2])


def test_batch_chunk_extraction_parity(can_pod5, can_mappings):
    """Vectorized whole-read extraction is bit-identical to the per-chunk
    path on real reads (the inference prep hot stage)."""
    from remora_tpu.core.seq import Motif
    from remora_tpu.data.chunk_batch import extract_chunks_batch
    from remora_tpu.io.read import extract_alignments, iter_signal
    from remora_tpu.io.read_index import ReadIndexedBam

    bam_idx = ReadIndexedBam(str(can_mappings))
    motifs = [Motif("CG", 0)]
    n_checked = 0
    for read_err in iter_signal(str(can_pod5), num_reads=4):
        for io_read, err in extract_alignments(read_err, bam_idx):
            rr = io_read.into_remora_read(False)
            rr.set_motif_focus_bases(motifs)
            chunks = [
                c
                for c in rr.iter_chunks((200, 200), (4, 4), base_start_justify=False, offset=0)
                if c.seq_len <= 402
            ]
            arrays, _n_long = extract_chunks_batch(
                rr, (200, 200), (4, 4), 402, motifs=motifs
            )
            assert arrays["signal"].shape[0] == len(chunks)
            for i, c in enumerate(chunks):
                sl = c.seq_len
                assert arrays["sequence_lengths"][i] == sl
                assert np.array_equal(arrays["signal"][i, 0], c.signal)
                assert np.array_equal(
                    arrays["sequence_to_signal_mapping"][i, : sl + 1].astype(
                        np.int32
                    ),
                    c.seq_to_sig_map,
                )
                assert np.array_equal(
                    arrays["sequence"][i, : c.seq_w_context.size],
                    c.seq_w_context,
                )
            n_checked += len(chunks)
    assert n_checked > 100
