"""Visualize the banded refinement DP for one read segment.

Reference analog ``scripts/plot_map_refine.py``: plots the signal, the
expected levels, the band boundaries and the refined path.
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pod5")
    parser.add_argument("bam")
    parser.add_argument("--read-id")
    parser.add_argument("--levels", required=True, help="k-mer level table")
    parser.add_argument("--start-base", type=int, default=100)
    parser.add_argument("--num-bases", type=int, default=50)
    parser.add_argument("--out-path", default="map_refine.png")
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from remora_tpu.io.pod5 import DatasetReader
    from remora_tpu.io.read import Read
    from remora_tpu.io.read_index import ReadIndexedBam
    from remora_tpu.refine.band import (
        adjust_seq_band,
        compute_sig_band,
        convert_to_seq_band,
    )
    from remora_tpu.refine.refiner import SigMapRefiner, refine_signal_mapping

    smr = SigMapRefiner(
        kmer_model_filename=args.levels,
        do_rough_rescale=True,
        scale_iters=0,
        do_fix_guage=True,
    )
    bam_idx = ReadIndexedBam(args.bam)
    read_id = args.read_id or bam_idx.read_ids[0]
    with DatasetReader(args.pod5) as dr:
        io_read = Read.from_pod5_and_alignment(
            pod5_read_record=dr.get_read(read_id),
            alignment_record=bam_idx.get_first_alignment(read_id),
        )
    rread = io_read.into_remora_read(True)
    shift, scale = smr.rough_rescale(
        rread.shift, rread.scale, rread.seq_to_sig_map, rread.int_seq,
        rread.dacs,
    )
    rread.shift, rread.scale = shift, scale
    rread._reset_cache()

    st, en = args.start_base, args.start_base + args.num_bases
    seg_map = rread.seq_to_sig_map[st : en + 1].copy()
    levels = smr.extract_levels(rread.int_seq)[st:en]
    sig = rread.sig
    seg_sig = sig[seg_map[0] : seg_map[-1]]
    seg_map0 = seg_map - seg_map[0]

    path, _scores, _tb, seq_band, _offs = refine_signal_mapping(
        sig,
        rread.seq_to_sig_map[st : en + 1],
        levels,
        refine_algo=smr.algo,
        short_dwell_pen=smr.sd_arr,
        band_half_width=smr.half_bandwidth,
    )
    path0 = path - seg_map[0]

    fig, ax = plt.subplots(figsize=(16, 6))
    x = np.arange(seg_sig.size)
    ax.plot(x, seg_sig, color="black", lw=0.8, label="signal")
    for bi in range(en - st):
        ax.hlines(levels[bi], seg_map0[bi], seg_map0[bi + 1],
                  colors="tab:blue", lw=2,
                  label="level (input map)" if bi == 0 else None)
        ax.hlines(levels[bi], path0[bi], path0[bi + 1], colors="tab:red",
                  lw=2, linestyles="--",
                  label="level (refined map)" if bi == 0 else None)
    for bi in range(en - st):
        ax.axvline(seg_map0[bi], color="tab:blue", alpha=0.2, lw=0.5)
        ax.axvline(path0[bi], color="tab:red", alpha=0.2, lw=0.5)
    ax.set_xlabel("Signal position (segment)")
    ax.set_ylabel("Normalized signal")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out_path)
    print(f"Wrote {args.out_path}")


if __name__ == "__main__":
    main()
