"""Synthetic POD5+BAM set + model checkpoint for pipeline benchmarks.

Generates N forward-orientation DNA reads (CG-bearing random sequence,
per-base dwells, level+noise signal) with the native writers, plus a
production-shape ConvLSTM checkpoint (size 64, chunk context (200, 200),
9-mer), so infer/ETL throughput benchmarks run at realistic scale
without shipping large data files.
"""

import uuid

import numpy as np

BASE_LVL = {0: -1.2, 1: -0.4, 2: 0.4, 3: 1.2}


def synth_read(rng, n_bases):
    int_seq = rng.integers(0, 4, n_bases)
    levels = np.array([BASE_LVL[int(b)] for b in int_seq])
    dwells = rng.integers(4, 12, n_bases)
    s2s = np.concatenate([[0], np.cumsum(dwells)])
    norm = np.repeat(levels, dwells) + rng.normal(0, 0.1, s2s[-1])
    shift, scale = 90.0, 20.0
    dacs = np.clip(norm * scale + shift, -500, 3000).astype(np.int16)
    return int_seq, s2s, dacs


def write_synth_set(out_dir, n_reads=200, n_bases=4000, seed=17):
    """Write reads.pod5 + reads.bam under out_dir; returns the paths."""
    from remora_tpu.core.seq import int_to_seq
    from remora_tpu.io.bam import BamHeader, BamRecord, BamWriter
    from remora_tpu.io.pod5_write import Pod5Writer

    rng = np.random.default_rng(seed)
    pod5_path = f"{out_dir}/reads.pod5"
    bam_path = f"{out_dir}/reads.bam"
    ref_len = (n_bases + 1000) * n_reads
    header = BamHeader(
        text=f"@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:ctg1\tLN:{ref_len}\n",
        references=["ctg1"],
        lengths=[ref_len],
    )
    with Pod5Writer(pod5_path) as p5w, BamWriter(bam_path, header) as bw:
        for ri in range(n_reads):
            rid = str(uuid.uuid4())
            int_seq, s2s, dacs = synth_read(rng, n_bases)
            p5w.add_read(rid, dacs, 90.0, 20.0)
            mv = np.zeros(int(s2s[-1]), dtype=np.uint8)
            mv[s2s[:-1]] = 1
            seq = int_to_seq(int_seq)
            rec = BamRecord(
                query_name=rid,
                flag=0,
                reference_id=0,
                reference_start=(n_bases + 1000) * ri,
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


def write_synth_model(out_dir, size=64, kmer_len=9, num_out=2,
                      chunk_context=(200, 200), kmer_context_bases=(4, 4)):
    """Random-weight production-shape ConvLSTM checkpoint for throughput
    benchmarks (outputs are meaningless; shapes/compute are real)."""
    import jax

    from remora_tpu.data.metadata import DatasetMetadata
    from remora_tpu.models import conv_lstm_model, model_io

    params, bn_state = conv_lstm_model.init(
        jax.random.PRNGKey(0), size=size, kmer_len=kmer_len,
        num_out=num_out,
    )
    md = DatasetMetadata(
        allocate_size=1,
        max_seq_len=(sum(chunk_context)) // 5,
        mod_bases=["m"],
        mod_long_names=["5mC"],
        motif_sequences=["CG"],
        motif_offsets=[0],
        chunk_context=chunk_context,
        kmer_context_bases=kmer_context_bases,
    )
    meta, arrays = model_io.make_model_metadata(
        md, "ConvLSTM_w_ref",
        {"size": size, "kmer_len": kmer_len, "num_out": num_out},
    )
    path = f"{out_dir}/synth_model.npz"
    model_io.save_model(path, params, bn_state, meta, arrays)
    return path
