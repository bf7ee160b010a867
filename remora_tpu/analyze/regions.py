"""Reference-region pileup utilities.

Reference analog ``src/remora/io.py:523–1044``: region iteration with
coverage-capped sampling, region sequence/level reconstruction from
covering reads, per-region per-base metrics.

Region queries run as overlap filters over the in-memory record index
(remora_tpu BAM files are scanned once and held decompressed; a BAI-style
interval index can be added for very large files).
"""

import random

import numpy as np

from remora_tpu import RemoraError, log
from remora_tpu.core import seq as sequtil
from remora_tpu.io.bam import FastBamScanner
from remora_tpu.io.read import Read
from remora_tpu.io.read_index import get_parent_id, read_is_primary, strands_match
from remora_tpu.io.refregion import RefRegion

LOGGER = log.get_logger()


class RegionIndexedBam:
    """Overlap queries over a scanned BAM (reference ``fetch`` analog)."""

    def __init__(self, bam_path):
        self.scanner = FastBamScanner(bam_path)
        self.header = self.scanner.header
        self._by_ref = {}
        for rec in self.scanner:
            if rec.is_unmapped:
                continue
            self._by_ref.setdefault(rec.reference_name, []).append(rec)
        for recs in self._by_ref.values():
            recs.sort(key=lambda r: r.reference_start)

    def fetch(self, ctg, start, end, strand=None):
        for rec in self._by_ref.get(ctg, []):
            if rec.reference_start >= end:
                break
            if rec.reference_end > start and strands_match(strand, rec):
                yield rec


def iter_regions(bam, reg_len=100_000):
    header = bam.header
    for ctg, ctg_len in zip(header.references, header.lengths):
        for st in range((ctg_len // reg_len) + 1):
            for strand in "+-":
                yield RefRegion(
                    ctg=ctg,
                    strand=strand,
                    start=st * reg_len,
                    end=(st + 1) * reg_len,
                )


def get_reg_bam_reads(ref_reg, bam):
    return [
        rec
        for rec in bam.fetch(ref_reg.ctg, ref_reg.start, ref_reg.end)
        if read_is_primary(rec) and strands_match(ref_reg.strand, rec)
    ]


def iter_covered_regions(bam_path, chunk_len=1_000, max_chunk_cov=None):
    bam = RegionIndexedBam(bam_path)
    for reg in iter_regions(bam, chunk_len):
        bam_reads = get_reg_bam_reads(reg, bam)
        if len(bam_reads) == 0:
            continue
        if max_chunk_cov is not None:
            target_bases = chunk_len * max_chunk_cov
            total_bases = 0
            random.shuffle(bam_reads)
            sampled = []
            for rec in bam_reads:
                sampled.append(rec)
                total_bases += min(rec.reference_end, reg.end) - max(
                    rec.reference_start, reg.start
                )
                if total_bases >= target_bases:
                    break
            bam_reads = sampled
        yield reg, bam_reads


def get_ref_int_seq_from_reads(ref_reg, bam_reads, ref_orient=True):
    """Forward reference int sequence pieced together from read MD tags."""
    int_seq = np.full(ref_reg.len, -2, np.int32)
    for rec in bam_reads:
        read_ref_seq = rec.get_reference_sequence().upper()
        int_seq[
            max(0, rec.reference_start - ref_reg.start) : (
                rec.reference_end - ref_reg.start
            )
        ] = sequtil.seq_to_int(
            read_ref_seq[
                max(0, ref_reg.start - rec.reference_start) : (
                    ref_reg.end - rec.reference_start
                )
            ]
        )
        if not np.any(int_seq == -2):
            break
    if ref_reg.strand == "-":
        valid = int_seq >= 0
        out = int_seq.copy()
        out[valid] = sequtil.INT_COMP[int_seq[valid]]
        return out if ref_orient else out[::-1]
    return int_seq


def get_ref_seq_from_reads(ref_reg, bam_reads, ref_orient=True):
    int_seq = get_ref_int_seq_from_reads(ref_reg, bam_reads, ref_orient)
    int_seq = int_seq.copy()
    int_seq[np.equal(int_seq, -2)] = -1
    return sequtil.int_to_seq(int_seq)


def get_ref_seq_and_levels_from_reads(ref_reg, bam_reads, sig_map_refiner,
                                      ref_orient=True):
    """Sequence + expected levels for a region from covering reads."""
    if sig_map_refiner is None or not sig_map_refiner.is_loaded:
        levels = None
        ctx = get_ref_int_seq_from_reads(ref_reg, bam_reads, ref_orient=False)
        ctx[np.equal(ctx, -2)] = -1
        seq = sequtil.int_to_seq(ctx)
    else:
        ctx = get_ref_int_seq_from_reads(
            ref_reg.adjust(
                -sig_map_refiner.bases_before,
                sig_map_refiner.bases_after,
                ref_orient=False,
            ),
            bam_reads,
            ref_orient=False,
        )
        levels = sig_map_refiner.extract_levels(np.clip(ctx, -1, 3))
        levels[np.equal(ctx, -2)] = np.nan
        ctx[np.equal(ctx, -2)] = -1
        seq = sequtil.int_to_seq(ctx)
        bb = sig_map_refiner.bases_before
        seq = seq[bb : bb + ref_reg.len]
        levels = levels[bb : bb + ref_reg.len]
    if ref_reg.strand == "-" and ref_orient:
        seq = seq[::-1]
        if levels is not None:
            levels = levels[::-1]
    return seq, levels


def get_pod5_reads(pod5_dr, read_ids):
    """Read records by id (reference analog ``io.get_pod5_reads``
    io.py:768–772)."""
    return {
        str(pod5_read.read_id): pod5_read
        for pod5_read in pod5_dr.reads(selection=list(read_ids))
    }


def get_io_reads(bam_reads, pod5_dr, reverse_signal=False, missing_ok=False,
                 pa_scaling=None):
    pod5_reads = get_pod5_reads(
        pod5_dr, set(get_parent_id(r) for r in bam_reads)
    )
    io_reads = []
    for rec in bam_reads:
        try:
            io_read = Read.from_pod5_and_alignment(
                pod5_read_record=pod5_reads[get_parent_id(rec)],
                alignment_record=rec,
                reverse_signal=reverse_signal,
                pa_scaling=pa_scaling,
            )
        except Exception:
            if missing_ok:
                continue
            raise RemoraError("BAM record not found in POD5")
        io_reads.append(io_read)
    return io_reads


def get_reads_reference_regions(
    ref_reg,
    pod5_bam_pairs,
    sig_map_refiner=None,
    skip_sig_map_refine=False,
    max_reads=50,
    reverse_signal=False,
    missing_ok=False,
    pa_scaling=None,
    signal_type="norm",
):
    all_bam_reads = []
    samples_read_ref_regs = []
    for pod5_dr, bam in pod5_bam_pairs:
        sample_bam_reads = get_reg_bam_reads(ref_reg, bam)
        if len(sample_bam_reads) == 0:
            raise RemoraError("No reads covering region")
        if max_reads is not None and len(sample_bam_reads) > max_reads:
            sample_bam_reads = random.sample(sample_bam_reads, max_reads)
        all_bam_reads.append(sample_bam_reads)
        io_reads = get_io_reads(
            sample_bam_reads, pod5_dr, reverse_signal,
            missing_ok=missing_ok, pa_scaling=pa_scaling,
        )
        if sig_map_refiner is not None and not skip_sig_map_refine:
            for io_read in io_reads:
                io_read.set_refine_signal_mapping(
                    sig_map_refiner, ref_mapping=True
                )
        samples_read_ref_regs.append(
            [
                io_read.extract_ref_reg(ref_reg, signal_type=signal_type)
                for io_read in io_reads
            ]
        )
    return samples_read_ref_regs, all_bam_reads


def get_ref_reg_sample_metrics(
    ref_reg,
    pod5_dr,
    bam_reads,
    metric,
    sig_map_refiner,
    skip_sig_map_refine=False,
    reverse_signal=False,
    ref_orient=True,
    missing_ok=False,
    pa_scaling=None,
    signal_type="norm",
    **kwargs,
):
    io_reads = get_io_reads(
        bam_reads, pod5_dr, reverse_signal,
        missing_ok=missing_ok, pa_scaling=pa_scaling,
    )
    if (
        sig_map_refiner is not None
        and sig_map_refiner.is_loaded
        and not skip_sig_map_refine
    ):
        for io_read in io_reads:
            io_read.set_refine_signal_mapping(sig_map_refiner, ref_mapping=True)
    sample_metrics = [
        io_read.compute_per_base_metric(
            metric, region=ref_reg, signal_type=signal_type, **kwargs
        )
        for io_read in io_reads
    ]
    if len(sample_metrics) <= 0:
        return None
    reg_metrics = {
        name: np.stack([mv[name] for mv in sample_metrics])
        for name in sample_metrics[0].keys()
    }
    if ref_orient and ref_reg.strand == "-":
        return {name: vals[:, ::-1] for name, vals in reg_metrics.items()}
    return reg_metrics


def get_ref_reg_samples_metrics(
    ref_reg,
    pod5_bam_pairs,
    sig_map_refiner=None,
    skip_sig_map_refine=False,
    max_reads=None,
    reverse_signal=False,
    metric="dwell_trimmean",
    missing_ok=False,
    **kwargs,
):
    all_bam_reads = []
    samples_metrics = []
    for pod5_dr, bam in pod5_bam_pairs:
        sample_bam_reads = get_reg_bam_reads(ref_reg, bam)
        if len(sample_bam_reads) == 0:
            raise RemoraError("No reads covering region")
        if max_reads is not None and len(sample_bam_reads) > max_reads:
            sample_bam_reads = random.sample(sample_bam_reads, max_reads)
        all_bam_reads.append(sample_bam_reads)
        sample_metrics = get_ref_reg_sample_metrics(
            ref_reg, pod5_dr, sample_bam_reads, metric, sig_map_refiner,
            skip_sig_map_refine, reverse_signal, **kwargs,
        )
        if sample_metrics is not None:
            samples_metrics.append(sample_metrics)
    return samples_metrics, all_bam_reads
