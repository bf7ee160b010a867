"""Band-width routing statistics at scale (VERDICT r4 #5).

Round 4's cap/routing decisions were tuned on the 28 bundled real reads
(n=28). This harness measures the per-read max band width distribution
and the host-routed share at several device caps over BOTH:

  * the bundled real reads (tests/data can+mod, ~28)
  * the 400-read x 4kb synthetic production set (benchmarks/synth_set),
    with optional long stalls injected at a configurable rate so the
    synthetic tail resembles real nanopore stall behaviour

Band construction matches the device router exactly
(refine.refiner._banded_search_space on the rough-rescaled mapping).

Usage: JAX_PLATFORMS=cpu python -m benchmarks.band_stats
       [--synth-reads N] [--stall-rate R] [--levels PATH] [--json PATH]
"""

import argparse
import json
import tempfile

import numpy as np

CAPS = (512, 1024, 2048, 4096)


def _read_bands(levels_path, pod5_path, bam_path, smr_kwargs=None):
    """Per-read max band width via the router's own band construction."""
    from remora_tpu.io.read import extract_alignments, iter_signal
    from remora_tpu.io.read_index import ReadIndexedBam
    from remora_tpu.refine.refiner import (
        SigMapRefiner,
        _banded_search_space,
    )

    smr = SigMapRefiner(
        kmer_model_filename=levels_path,
        do_rough_rescale=True,
        scale_iters=0,
        do_fix_guage=True,
        **(smr_kwargs or {}),
    )
    bam_idx = ReadIndexedBam(bam_path, req_tags={"mv"})
    widths = []
    for sig_read, err in iter_signal(pod5_path):
        for io_read, aerr in extract_alignments((sig_read, err), bam_idx,
                                                False):
            if aerr is not None:
                continue
            try:
                rd = io_read.into_remora_read(False)
                rd.shift, rd.scale = smr.rough_rescale(
                    rd.shift, rd.scale, rd.seq_to_sig_map, rd.int_seq,
                    rd.dacs,
                )
                origin = int(rd.seq_to_sig_map[0])
                bd = _banded_search_space(
                    rd.seq_to_sig_map - origin,
                    smr.extract_levels(rd.int_seq),
                    int(rd.seq_to_sig_map[-1]) - origin,
                    smr.half_bandwidth,
                    2,
                )
                widths.append(int((bd[1] - bd[0]).max()))
            except Exception as e:  # noqa: BLE001 — stats, not pipeline
                print(f"  skipped {io_read.read_id}: {e}")
    return np.array(widths)


def _summarize(name, widths):
    if widths.size == 0:
        print(f"{name}: no reads")
        return {}
    pct = {
        f"p{p}": int(np.percentile(widths, p)) for p in (50, 75, 90, 95, 99)
    }
    routed = {
        f"routed_frac_cap{c}": round(float((widths > c).mean()), 4)
        for c in CAPS
    }
    print(
        f"{name}: n={widths.size} max-band "
        + " ".join(f"{k}={v}" for k, v in pct.items())
        + f" max={int(widths.max())}"
    )
    for c in CAPS:
        print(
            f"  cap {c:5d}: {100 * routed[f'routed_frac_cap{c}']:.1f}% "
            "of reads routed to host"
        )
    return {"n": int(widths.size), **pct, "max": int(widths.max()),
            **routed}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synth-reads", type=int, default=400)
    ap.add_argument("--n-bases", type=int, default=4000)
    ap.add_argument(
        "--stall-rate", type=float, default=0.002,
        help="per-base probability of a stall dwell (sizes log-uniform "
        "50..2500 samples, the shape of the real-read band tail)",
    )
    ap.add_argument("--levels", help="k-mer level table (default: "
                    "estimate from the bundled reads)")
    ap.add_argument("--json", help="write the summary record here")
    args = ap.parse_args()

    data = "/root/reference/tests/data"
    workdir = tempfile.mkdtemp(prefix="band_stats_")

    levels = args.levels
    if levels is None:
        from remora_tpu.analyze.kmer_levels import estimate_kmer_levels

        levels = f"{workdir}/levels.txt"
        estimate_kmer_levels(
            pod5_and_bams=[(f"{data}/can_reads.pod5",
                            f"{data}/can_mappings.bam")],
            out_path=levels,
            kmer_context_bases=(1, 1),
            min_coverage=3,
            chunk_len=2000,
        )

    record = {"caps": list(CAPS), "stall_rate": args.stall_rate}

    real = np.concatenate([
        _read_bands(levels, f"{data}/can_reads.pod5",
                    f"{data}/can_mappings.bam"),
        _read_bands(levels, f"{data}/mod_reads.pod5",
                    f"{data}/mod_mappings.bam"),
    ])
    record["real"] = _summarize("real bundled reads", real)

    # synthetic set with injected stalls
    from benchmarks import synth_set

    rng = np.random.default_rng(23)
    orig = synth_set.synth_read

    def stalled_read(r, n_bases):
        int_seq, s2s, dacs = orig(r, n_bases)
        if args.stall_rate > 0:
            dwells = np.diff(s2s)
            hits = rng.random(dwells.size) < args.stall_rate
            dwells[hits] += (
                10 ** rng.uniform(1.7, 3.4, int(hits.sum()))
            ).astype(np.int64)
            s2s = np.concatenate([[0], np.cumsum(dwells)])
            lvl = np.repeat(
                np.array([synth_set.BASE_LVL[int(b)] for b in int_seq]),
                dwells,
            )
            norm = lvl + rng.normal(0, 0.1, s2s[-1])
            dacs = np.clip(norm * 20.0 + 90.0, -500, 3000).astype(np.int16)
        return int_seq, s2s, dacs

    synth_set.synth_read = stalled_read
    try:
        pod5_path, bam_path = synth_set.write_synth_set(
            workdir, n_reads=args.synth_reads, n_bases=args.n_bases
        )
    finally:
        synth_set.synth_read = orig
    synth = _read_bands(levels, pod5_path, bam_path)
    record["synthetic"] = _summarize(
        f"synthetic {args.synth_reads}x{args.n_bases} "
        f"(stall rate {args.stall_rate})", synth
    )

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(record, fh, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
