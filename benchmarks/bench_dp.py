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
        import jax
        import jax.numpy as jnp

        from remora_tpu.kernels.pallas_dp import (
            banded_dp_batch_pallas,
            refine_batch_pallas,
        )
        from remora_tpu.kernels.refine_dp import pad_reads_for_dp

        t0 = time.time()
        pl_paths = refine_batch_pallas(reads2, sdp, algo="dwell_penalty")
        print(f"pallas DP compile+run: {time.time() - t0:.1f}s")
        # end-to-end on a fresh batch: pack + h2d transfer + kernels +
        # path d2h (on a tunneled backend this is transfer-dominated)
        reads3 = _make_reads(rng, args.reads, args.seq_len)
        t0 = time.time()
        refine_batch_pallas(reads3, sdp, algo="dwell_penalty")
        dt = time.time() - t0
        print(
            f"pallas DP end-to-end: {dt * 1000:.0f}ms/batch -> "
            f"{args.reads * args.seq_len / dt:,.0f} bases/s"
        )
        # compute-only: device-resident inputs, sync on device output
        from remora_tpu.kernels.pallas_dp import compute_chunk_seg

        packed = pad_reads_for_dp(reads3, w_max=None)
        W = -(-max(packed["w_max"], 8) // 8) * 8
        seg = compute_chunk_seg(
            packed["band_starts"], packed["band_widths"],
            packed["seq_lens"], 16, W,
        )
        dev = {
            k: jax.block_until_ready(jnp.asarray(packed[k]))
            for k in (
                "signal", "levels", "band_starts", "band_widths",
                "seq_lens",
            )
        }
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = banded_dp_batch_pallas(
                dev["signal"], dev["levels"], dev["band_starts"],
                dev["band_widths"], dev["seq_lens"], sdp,
                algo="dwell_penalty", w_max=packed["w_max"], seg=seg,
            )
            jax.block_until_ready(out[0])
            best = min(best, time.time() - t0)
        print(
            f"pallas DP compute: {best * 1000:.0f}ms/batch -> "
            f"{args.reads * args.seq_len / best:,.0f} bases/s"
        )
        # correctness vs the host native path (near-tie DP decisions can
        # flip under the TPU float environment; count positions)
        from remora_tpu.io.native import banded_dp_path

        n_bad = n_tot = 0
        for (sig, lv, band), pp in zip(reads2, pl_paths):
            hp = banded_dp_path(sig, lv, band, sdp, "dwell_penalty")
            if hp is not None:
                n_bad += int((hp != pp).sum())
                n_tot += len(hp)
        print(
            f"pallas vs native mismatched positions: {n_bad}/{n_tot}"
            f" ({n_bad / max(n_tot, 1):.3%})"
        )


if __name__ == "__main__":
    main()
