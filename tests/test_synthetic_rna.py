"""Synthetic reverse-signal (RNA-style) end-to-end test.

Generates POD5 + BAM from scratch with the native writers (signal stored
3'->5' as sequencers emit it), then runs prepare -> train -> infer with
reverse_signal=True through the real drivers.
"""

import uuid

import numpy as np
import pytest

BASE_LVL = {0: -1.2, 1: -0.4, 2: 0.4, 3: 1.2}


def _synth_read(rng, n_bases=400):
    int_seq = rng.integers(0, 4, n_bases)
    levels = np.array([BASE_LVL[int(b)] for b in int_seq])
    dwells = rng.integers(3, 9, n_bases)
    s2s = np.concatenate([[0], np.cumsum(dwells)])  # 5'->3'
    norm = np.repeat(levels, dwells) + rng.normal(0, 0.1, s2s[-1])
    shift, scale = 90.0, 20.0
    dacs_53 = np.clip(norm * scale + shift, -500, 3000).astype(np.int16)
    return int_seq, s2s, dacs_53


@pytest.fixture(scope="session")
def synth_rna_data(tmpdir_factory):
    from remora_tpu.core.seq import int_to_seq
    from remora_tpu.io.bam import BamHeader, BamRecord, BamWriter
    from remora_tpu.io.pod5_write import Pod5Writer

    rng = np.random.default_rng(11)
    out_dir = tmpdir_factory.mktemp("synth_rna")
    pod5_path = str(out_dir / "reads.pod5")
    bam_path = str(out_dir / "reads.bam")

    header = BamHeader(
        text="@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:ctg1\tLN:100000\n",
        references=["ctg1"],
        lengths=[100_000],
    )
    n_reads = 6
    with Pod5Writer(pod5_path) as p5w, BamWriter(bam_path, header) as bw:
        for ri in range(n_reads):
            rid = str(uuid.uuid4())
            int_seq, s2s, dacs_53 = _synth_read(rng)
            sig_len = int(s2s[-1])
            # store signal in sequencing (3'->5') orientation
            p5w.add_read(rid, dacs_53[::-1], 90.0, 20.0)
            # move table refers to the stored orientation:
            # final q2s (5'->3') = sig_len - raw[::-1]
            raw_moves = (sig_len - s2s[1:])[::-1]
            mv = np.zeros(sig_len, dtype=np.uint8)
            mv[raw_moves] = 1
            seq = int_to_seq(int_seq)
            rec = BamRecord(
                query_name=rid,
                flag=0,
                reference_id=0,
                reference_start=1000 * ri,
                mapq=60,
                cigartuples=[(0, len(seq))],
                query_sequence=seq,
                query_qualities=np.full(len(seq), 30, np.uint8),
                tags=[
                    ("MD", "Z", str(len(seq))),
                    ("sm", "f", 0.0),
                    ("sd", "f", 1.0),
                    ("mv", "Bc", np.concatenate(
                        [[1], mv]).astype(np.int8)),
                ],
                header=header,
            )
            bw.write(rec)
    return pod5_path, bam_path


def test_reverse_signal_prepare(tmpdir_factory, synth_rna_data):
    from remora_tpu.core.seq import Motif
    from remora_tpu.data.dataset import CoreDataset
    from remora_tpu.prepare import extract_chunk_dataset
    from remora_tpu.refine.refiner import SigMapRefiner

    pod5_path, bam_path = synth_rna_data
    out = tmpdir_factory.mktemp("synth_rna_ds") / "chunks"
    extract_chunk_dataset(
        bam_path=bam_path,
        pod5_path=pod5_path,
        out_path=str(out),
        mod_base=("a", "m6A"),
        mod_base_control=False,
        motifs=[Motif("A", 0)],
        focus_ref_pos=None,
        chunk_context=(50, 50),
        min_samps_per_base=2,
        max_chunks_per_read=20,
        pa_scaling=None,
        sig_map_refiner=SigMapRefiner(),
        kmer_context_bases=(2, 2),
        base_start_justify=False,
        offset=0,
        num_reads=None,
        rev_sig=True,
    )
    ds = CoreDataset(str(out))
    assert ds.size > 50
    assert ds.metadata.reverse_signal is True
    # signal around each focus base should resemble the A level: check
    # the dataset's mean signal is finite and within range
    batch = next(iter(ds))
    assert np.isfinite(batch["signal"]).all()
    # chunk center (focus base = A) should be low level (~-1.2 pre-noise,
    # normalized by sm/sd=0/1 on dacs->norm with synthetic shift/scale)
    center = batch["signal"][:, 0, 45:55].mean()
    assert center < batch["signal"].mean()
