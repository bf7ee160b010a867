"""Full streaming inference pipeline throughput (reads/s, samples/s).

Default: a synthetic production-scale set (N reads x ~4kb bases, random-
weight size-64 ConvLSTM) generated on the fly with the native POD5/BAM
writers — stable, environment-independent input. --pod5/--bam/--model
override with real data. REMORA_TPU_INFER_STAGE_STATS=1 logs per-queue
occupancy so the bottleneck stage is visible.
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", help="checkpoint (default: synthetic)")
    parser.add_argument("--pod5")
    parser.add_argument("--bam")
    parser.add_argument("--synth-reads", type=int, default=200)
    parser.add_argument("--synth-bases", type=int, default=4000)
    parser.add_argument("--batch-size", type=int, default=2048)
    parser.add_argument("--repeat", type=int, default=3)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--post-workers", type=int, default=2)
    parser.add_argument("--refine-backend", default=None)
    args = parser.parse_args()

    from remora_tpu.infer.infer import ModelHandle, infer_from_pod5_and_bam

    with tempfile.TemporaryDirectory() as synth_dir:
        pod5, bam, model = args.pod5, args.bam, args.model
        if not (pod5 and bam):
            from synth_set import write_synth_set

            t0 = time.time()
            pod5, bam = write_synth_set(
                synth_dir, n_reads=args.synth_reads,
                n_bases=args.synth_bases,
            )
            print(f"synth set: {args.synth_reads} reads x "
                  f"{args.synth_bases} bases ({time.time() - t0:.1f}s)")
        if not model:
            from synth_set import write_synth_model

            model = write_synth_model(synth_dir)
        handle = ModelHandle.load(model)

        total_reads = 0
        t0 = time.time()
        for _ in range(args.repeat):
            with tempfile.TemporaryDirectory() as tmp:
                n = infer_from_pod5_and_bam(
                    pod5_path=pod5,
                    in_bam_path=bam,
                    models=[handle],
                    out_bam_path=f"{tmp}/out.bam",
                    batch_size=args.batch_size,
                    num_extract_alignment_workers=args.workers,
                    num_prep_read_workers=args.workers,
                    num_prep_nn_input_workers=2,
                    num_post_process_workers=args.post_workers,
                    refine_backend=args.refine_backend,
                )
                total_reads += n
        dt = time.time() - t0
        print(
            f"infer pipeline: {total_reads / dt:.2f} reads/s "
            f"({dt:.1f}s total, {total_reads} reads)"
        )


if __name__ == "__main__":
    main()
