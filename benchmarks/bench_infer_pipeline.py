"""Full streaming inference pipeline throughput (reads/s, samples/s)."""

import argparse
import tempfile
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument(
        "--pod5", default="/root/reference/tests/data/can_reads.pod5"
    )
    parser.add_argument(
        "--bam", default="/root/reference/tests/data/can_mappings.bam"
    )
    parser.add_argument("--batch-size", type=int, default=1024)
    parser.add_argument("--repeat", type=int, default=3)
    parser.add_argument("--workers", type=int, default=2)
    args = parser.parse_args()

    from remora_tpu.infer.infer import ModelHandle, infer_from_pod5_and_bam

    handle = ModelHandle.load(args.model)
    total_reads = 0
    t0 = time.time()
    for _ in range(args.repeat):
        with tempfile.TemporaryDirectory() as tmp:
            n = infer_from_pod5_and_bam(
                pod5_path=args.pod5,
                in_bam_path=args.bam,
                models=[handle],
                out_bam_path=f"{tmp}/out.bam",
                batch_size=args.batch_size,
                num_extract_alignment_workers=args.workers,
                num_prep_read_workers=args.workers,
            )
            total_reads += n
    dt = time.time() - t0
    print(f"infer pipeline: {total_reads / dt:.2f} reads/s ({dt:.1f}s total)")


if __name__ == "__main__":
    main()
