"""Single-core per-read cost of the inference host-prep chain.

PERF.md round 4 measured prepare_reads at 2.89 ms/read single-core and
called it the wall between the observed ~136 reads/s and the chip's
~400 reads/s equivalent. This harness times each stage of the chain in
isolation on the synthetic production-shape set (400 reads x 4kb,
benchmarks/synth_set.py) so optimizations can be attributed:

  decode       iter_signal (POD5 decode + scaling)
  align        extract_alignments (BAM seek + move-table join)
  to_remora    io.Read.into_remora_read
  focus        set_motif_focus_bases
  refine       refine_signal_mapping (rough rescale; scale_iters=0)
  extract      extract_chunks_batch -> padded chunk arrays
  prep_total   prepare_reads (the full stage as the pipeline runs it)

Usage: python -m benchmarks.bench_prep [--reads N] [--profile]
"""

import argparse
import cProfile
import io as _io
import pstats
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=200)
    ap.add_argument("--n-bases", type=int, default=4000)
    ap.add_argument("--profile", action="store_true",
                    help="print a cProfile top-25 of prepare_reads")
    args = ap.parse_args()

    from benchmarks.synth_set import write_synth_model, write_synth_set
    from remora_tpu.core.seq import Motif
    from remora_tpu.infer.infer import prepare_reads
    from remora_tpu.io.read import extract_alignments, iter_signal
    from remora_tpu.io.read_index import ReadIndexedBam
    from remora_tpu.models import model_io

    out_dir = tempfile.mkdtemp(prefix="bench_prep_")
    pod5_path, bam_path = write_synth_set(
        out_dir, n_reads=args.reads, n_bases=args.n_bases
    )
    ckpt = write_synth_model(out_dir)
    _model, _params, _bn, meta = model_io.load_model(ckpt)
    models_metadata = [meta]
    motifs = [Motif(*mot) for mot in meta["motifs"]]

    t0 = time.perf_counter()
    signals = list(iter_signal(pod5_path))
    t_decode = time.perf_counter() - t0

    bam_idx = ReadIndexedBam(bam_path, req_tags={"mv"})
    t0 = time.perf_counter()
    read_errs = []
    for sig_read, err in signals:
        read_errs.extend(extract_alignments((sig_read, err), bam_idx, False))
    t_align = time.perf_counter() - t0

    n = len(read_errs)
    per = lambda t: t / n * 1e3  # noqa: E731

    # stage-by-stage timings on fresh copies (prepare_reads mutates)
    t0 = time.perf_counter()
    remora_reads = [
        io_read.into_remora_read(False) for io_read, _err in read_errs
    ]
    t_to_remora = time.perf_counter() - t0

    t0 = time.perf_counter()
    mdl_reads = []
    for rr in remora_reads:
        mr = rr.copy()
        mr.set_motif_focus_bases(motifs)
        mdl_reads.append(mr)
    t_focus = time.perf_counter() - t0

    smr = meta["sig_map_refiner"]
    t0 = time.perf_counter()
    if smr is not None and smr.is_loaded:
        for mr in mdl_reads:
            mr.refine_signal_mapping(smr)
    t_refine = time.perf_counter() - t0

    from remora_tpu.data.chunk_batch import extract_chunks_batch

    t0 = time.perf_counter()
    for mr in mdl_reads:
        extract_chunks_batch(
            mr,
            meta["chunk_context"],
            meta["kmer_context_bases"],
            meta["chunk_len"] + 2,
            base_start_justify=meta["base_start_justify"],
            offset=meta["offset"],
            motifs=motifs,
            tight=True,  # what the inference prep stage runs
        )
    t_extract = time.perf_counter() - t0

    if args.profile:
        prof = cProfile.Profile()
        prof.runcall(prepare_reads, read_errs, models_metadata, False)
        s = _io.StringIO()
        pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(25)
        print(s.getvalue())
        # reads were pruned by the profiled call: rebuild for the timing
        read_errs = []
        for sig_read, err in list(iter_signal(pod5_path)):
            read_errs.extend(
                extract_alignments((sig_read, err), bam_idx, False)
            )

    t0 = time.perf_counter()
    prepped = prepare_reads(read_errs, models_metadata, False)
    t_total = time.perf_counter() - t0
    ok = sum(1 for _r, arrs, err in prepped if err is None)

    print(f"reads: {n} ({ok} prepped ok), single core, ms/read:")
    for name, t in (
        ("decode", t_decode), ("align", t_align),
        ("to_remora", t_to_remora), ("focus", t_focus),
        ("refine", t_refine), ("extract", t_extract),
        ("prep_total", t_total),
    ):
        print(f"  {name:<10} {per(t):6.2f}")


if __name__ == "__main__":
    main()
