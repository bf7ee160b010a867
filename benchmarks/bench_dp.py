"""Refinement DP throughput: native C++ host kernel + batched device kernel."""

import argparse
import time

import numpy as np


def _make_reads(rng, n_reads, seq_len):
    from remora_tpu.refine.band import (
        adjust_seq_band,
        compute_sig_band,
        convert_to_seq_band,
    )

    reads = []
    for _ in range(n_reads):
        spb = rng.integers(3, 15, seq_len)
        bps = np.concatenate([[0], np.cumsum(spb)]).astype(np.int64)
        levels = rng.normal(size=seq_len).astype(np.float32)
        signal = rng.normal(size=int(bps[-1])).astype(np.float32)
        sig_band = compute_sig_band(bps, levels, bhw=5)
        seq_band = convert_to_seq_band(sig_band)
        adjust_seq_band(seq_band)
        reads.append((signal, levels, seq_band))
    return reads


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reads", type=int, default=32)
    parser.add_argument("--seq-len", type=int, default=6000)
    parser.add_argument("--skip-device", action="store_true")
    parser.add_argument("--pallas", action="store_true",
                        help="also run the single-launch Pallas kernels")
    args = parser.parse_args()

    from remora_tpu.io.native import banded_dp_path, get_lib
    from remora_tpu.refine.refiner import compute_dwell_pen_array

    rng = np.random.default_rng(0)
    sdp = compute_dwell_pen_array(4, 3, 0.5)
    reads = _make_reads(rng, args.reads, args.seq_len)

    if get_lib() is not None:
        t0 = time.time()
        for sig, lv, band in reads:
            banded_dp_path(sig, lv, band, sdp, "dwell_penalty")
        dt = time.time() - t0
        print(
            f"native C++ DP: {dt / args.reads * 1000:.1f}ms/read -> "
            f"{args.reads * args.seq_len / dt:,.0f} bases/s"
        )
    if args.skip_device and not args.pallas:
        return
    from remora_tpu.jax_setup import ensure_compilation_cache

    ensure_compilation_cache()
    reads2 = _make_reads(rng, args.reads, args.seq_len)
    if not args.skip_device:
        from remora_tpu.kernels.refine_dp import refine_batch

        t0 = time.time()
        refine_batch(reads, sdp, algo="dwell_penalty")
        print(f"device DP compile+run: {time.time() - t0:.1f}s")
        t0 = time.time()
        refine_batch(reads2, sdp, algo="dwell_penalty")
        dt = time.time() - t0
        print(
            f"device DP: {dt * 1000:.0f}ms/batch -> "
            f"{args.reads * args.seq_len / dt:,.0f} bases/s"
        )

    if args.pallas:
        from remora_tpu.kernels.pallas_dp import refine_batch_pallas

        t0 = time.time()
        pl_paths = refine_batch_pallas(reads2, sdp, algo="dwell_penalty")
        print(f"pallas DP compile+run: {time.time() - t0:.1f}s")
        reads3 = _make_reads(rng, args.reads, args.seq_len)
        t0 = time.time()
        refine_batch_pallas(reads3, sdp, algo="dwell_penalty")
        dt = time.time() - t0
        print(
            f"pallas DP: {dt * 1000:.0f}ms/batch -> "
            f"{args.reads * args.seq_len / dt:,.0f} bases/s"
        )
        # correctness vs the host native path on the timed batch
        from remora_tpu.io.native import banded_dp_path

        n_bad = 0
        for (sig, lv, band), pp in zip(reads2, pl_paths):
            hp = banded_dp_path(sig, lv, band, sdp, "dwell_penalty")
            if hp is not None and not np.array_equal(hp, pp):
                n_bad += 1
        print(f"pallas vs native mismatches: {n_bad}/{len(reads2)}")


if __name__ == "__main__":
    main()
