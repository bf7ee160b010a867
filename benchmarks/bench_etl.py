"""ETL throughput: dataset prepare over POD5+BAM (reads/s, chunks/s)."""

import argparse
import tempfile
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--pod5", default="/root/reference/tests/data/can_reads.pod5"
    )
    parser.add_argument(
        "--bam", default="/root/reference/tests/data/can_mappings.bam"
    )
    parser.add_argument("--levels", help="optional refine levels table")
    parser.add_argument("--refine-scale-iters", type=int, default=1)
    parser.add_argument(
        "--refine-backend", default="auto",
        choices=("auto", "native", "numpy", "device"),
        help="banded-DP backend; 'device' batches reads' DPs into "
        "shared Pallas launches on the accelerator",
    )
    parser.add_argument("--repeat", type=int, default=3)
    parser.add_argument("--workers", type=int, default=2)
    args = parser.parse_args()

    from remora_tpu.core.seq import Motif
    from remora_tpu.prepare import extract_chunk_dataset
    from remora_tpu.refine.refiner import SigMapRefiner

    if args.levels:
        smr = SigMapRefiner(
            kmer_model_filename=args.levels,
            do_rough_rescale=True,
            scale_iters=args.refine_scale_iters,
            do_fix_guage=True,
            backend=args.refine_backend,
        )
    else:
        smr = SigMapRefiner()

    total_reads = total_chunks = 0
    t0 = time.time()
    for rep in range(args.repeat):
        with tempfile.TemporaryDirectory() as tmp:
            ds = extract_chunk_dataset(
                bam_path=args.bam,
                pod5_path=args.pod5,
                out_path=f"{tmp}/chunks",
                mod_base=None,
                mod_base_control=True,
                motifs=[Motif("CG", 0)],
                focus_ref_pos=None,
                chunk_context=(200, 200),
                min_samps_per_base=5,
                max_chunks_per_read=15,
                pa_scaling=None,
                sig_map_refiner=smr,
                kmer_context_bases=(4, 4),
                base_start_justify=False,
                offset=0,
                num_reads=None,
                num_extract_alignment_workers=args.workers,
                num_extract_chunks_workers=args.workers,
                skip_shuffle=True,
            )
            total_chunks += ds.size
            rids = ds.read_ids[
                ds.metadata.dataset_start : ds.metadata.dataset_end
            ]
            total_reads += len(set(rids.tolist()))
    dt = time.time() - t0
    refined = (
        f"refined, backend={args.refine_backend}"
        if args.levels
        else "unrefined"
    )
    print(
        f"ETL ({refined}): {total_reads / dt:.1f} reads/s, "
        f"{total_chunks / dt:.1f} chunks/s ({dt:.1f}s total)"
    )


if __name__ == "__main__":
    main()
