"""Validate modBAM calls against ground-truth BED files.

Reference analog ``src/remora/validate.py:296–594``: per-read MM/ML
probabilities joined to ground-truth sites over aligned pairs, class
balancing, accuracy/filtered-accuracy report.
"""

import sys
from collections import defaultdict

import numpy as np

from remora_tpu import RemoraError, log
from remora_tpu.core.seq import revcomp
from remora_tpu.io.bam import FastBamScanner
from remora_tpu.io.refregion import parse_mods_bed
from remora_tpu.train.validate import process_mods_probs

LOGGER = log.get_logger()


def parse_mod_read(read, gt_sites, gt_ranges, alphabet, full_fh, nctx=5,
                   max_sites=None):
    strand = "-" if read.is_reverse else "+"
    ctg_gt = gt_sites.get((read.reference_name, strand))
    ctg_gt_range = gt_ranges.get((read.reference_name, strand))

    try:
        aligned_pairs = read.get_aligned_pairs(with_seq=True)
    except (ValueError, KeyError):
        LOGGER.debug(f"Read missing MD tag {read.query_name}")
        return [], []
    r_align = "".join(
        b.upper() if b else "-" for _, _, b in aligned_pairs
    )
    q_align = "".join(
        read.query_sequence[q] if q is not None else "-"
        for q, _, _ in aligned_pairs
    )

    q_mod_probs = defaultdict(dict)
    mod_bases = read.modified_bases or {}
    for (_cb, mod_strand, mod_name), mod_values in mod_bases.items():
        mod_name = str(mod_name)
        if (
            (mod_strand == 0 and read.is_reverse)
            or (mod_strand == 1 and not read.is_reverse)
            or mod_name not in alphabet
        ):
            continue
        for pos, prob in mod_values:
            q_mod_probs[pos][mod_name] = (prob + 0.5) / 256
    q_mod_probs_full = {}
    for q_pos, pos_probs in q_mod_probs.items():
        q_mod_probs_full[q_pos] = np.array(
            [1 - sum(pos_probs.values())]
            + [pos_probs.get(mn, 0) for mn in alphabet[1:]]
        )

    probs, labels = [], []
    prev_q_pos = prev_r_pos = None
    for a_idx, pair in enumerate(aligned_pairs):
        q_pos, r_pos, _b = pair
        if q_pos is not None:
            prev_q_pos = q_pos
        if r_pos is not None:
            prev_r_pos = r_pos
        r_pos_mod = None if ctg_gt is None else ctg_gt.get(r_pos)
        q_pos_mod_probs = q_mod_probs_full.get(q_pos)
        if r_pos_mod is None and q_pos_mod_probs is None:
            continue
        r_pos_mod_idx = (
            None if r_pos_mod is None else alphabet.index(r_pos_mod)
        )
        if full_fh is not None:
            probs_str = (
                None
                if q_pos_mod_probs is None
                else ",".join(map(str, q_pos_mod_probs))
            )
            if a_idx < nctx:
                r_pa = r_align[: a_idx + nctx + 1]
                q_pa = q_align[: a_idx + nctx + 1]
            else:
                r_pa = r_align[a_idx - nctx : a_idx + nctx + 1]
                q_pa = q_align[a_idx - nctx : a_idx + nctx + 1]
            r_pa = r_pa.rjust(nctx * 2 + 1, "-")
            q_pa = q_pa.rjust(nctx * 2 + 1, "-")
            if read.is_reverse:
                r_pa = revcomp(r_pa.replace("-", "N")).replace("N", "-")
                q_pa = revcomp(q_pa.replace("-", "N")).replace("N", "-")
            within_align = within_gt = False
            if prev_q_pos is not None:
                within_align = (
                    read.query_alignment_start
                    <= prev_q_pos
                    < read.query_alignment_end
                )
            if ctg_gt_range is not None and prev_r_pos is not None:
                within_gt = within_align and (
                    ctg_gt_range[0] <= prev_r_pos <= ctg_gt_range[1]
                )
            full_fh.write(
                f"{read.query_name}\t{q_pos}\t{read.reference_name}\t"
                f"{r_pos}\t{strand}\t{r_pos_mod_idx}\t{probs_str}\t"
                f"{r_pa}\t{q_pa}\t{within_align}\t{within_gt}\n"
            )
        if r_pos_mod is not None and q_pos_mod_probs is not None:
            labels.append(r_pos_mod_idx)
            probs.append(q_pos_mod_probs)
    if max_sites is not None and len(labels) > max_sites:
        indices = np.random.choice(len(labels), size=max_sites, replace=False)
        labels = [labels[i] for i in indices]
        probs = [probs[i] for i in indices]
    return probs, labels


def parse_mod_bam(bam_path, gt_sites, gt_ranges, alphabet, full_fh,
                  context_bases=5, max_sites=None):
    probs, labels = [], []
    do_warn_mod = do_warn_strand = True
    for read in FastBamScanner(bam_path):
        mb = read.modified_bases
        if mb is None:
            continue
        valid_mods = False
        for _cb, mod_strand, mod_name in mb.keys():
            mod_name = str(mod_name)
            if (mod_strand == 0 and read.is_reverse) or (
                mod_strand == 1 and not read.is_reverse
            ):
                if do_warn_strand:
                    LOGGER.warning(
                        "Reverse strand (duplex) mods not supported"
                    )
                    do_warn_strand = False
                continue
            if mod_name not in alphabet:
                if do_warn_mod:
                    LOGGER.warning(
                        f"Modified base found in BAM ({mod_name}) not found "
                        "in ground truth. Add with --extra-bases if needed."
                    )
                    do_warn_mod = False
                continue
            valid_mods = True
        if not valid_mods:
            continue
        r_probs, r_labels = parse_mod_read(
            read, gt_sites, gt_ranges, alphabet, full_fh,
            nctx=context_bases, max_sites=max_sites,
        )
        probs.extend(r_probs)
        labels.extend(r_labels)
    if len(probs) < 1:
        raise RemoraError(
            f"No valid modification calls from {bam_path}. Confirm that "
            "contig names from reference FASTA and ground truth BED match."
        )
    LOGGER.debug(f"Parsed {len(probs)} modified base calls from {bam_path}")
    return np.array(probs), np.array(labels)


def validate_modbams(bams_and_beds, full_results_path, name, pct_filt,
                     allow_unbalanced=False, seed=None, extra_bases=None,
                     max_sites_per_read=None, out_file=None):
    seed = (
        np.random.randint(0, np.iinfo(np.uint32).max, dtype=np.uint32)
        if seed is None
        else seed
    )
    np.random.seed(int(seed))
    LOGGER.debug(f"Seed selected is {seed}")

    full_fh = None
    if full_results_path is not None:
        full_fh = open(full_results_path, "w", buffering=512)
        full_fh.write(
            "query_name\tquery_pos\tref_name\tref_pos\tstrand\t"
            "gt_mod_idx\tmod_probs\tref_align\tquery_align\t"
            "within_align\twithin_gt\n"
        )

    LOGGER.info("Parsing ground truth BED files")
    bams, beds = zip(*bams_and_beds)
    parsed = {}
    all_gt_sites, all_gt_ranges = [], []
    all_mods = set()
    for bed_path in beds:
        if bed_path not in parsed:
            parsed[bed_path] = parse_mods_bed(bed_path)
        gt_sites, samp_mods = parsed[bed_path]
        all_gt_sites.append(gt_sites)
        all_gt_ranges.append(
            {cs: (min(poss), max(poss)) for cs, poss in gt_sites.items()}
        )
        all_mods.update(samp_mods)
    if extra_bases is not None:
        all_mods.update(extra_bases)
    can_base = all_mods.intersection("ACGTU")
    if len(can_base) > 1:
        raise RemoraError(f"More than one canonical base found: {can_base}")
    if len(can_base) == 0:
        raise RemoraError("No canonical bases found in ground truth.")
    mod_bases = all_mods.difference("ACGTU")
    alphabet = list(can_base) + sorted(mod_bases)

    LOGGER.info("Parsing modBAM files")
    all_probs, all_labels = [], []
    for bam_path, gt_sites, gt_ranges in zip(bams, all_gt_sites, all_gt_ranges):
        probs, labels = parse_mod_bam(
            bam_path, gt_sites, gt_ranges, alphabet, full_fh,
            max_sites=max_sites_per_read,
        )
        all_probs.append(probs)
        all_labels.append(labels)
    if full_fh is not None:
        full_fh.close()

    LOGGER.info(f"Alphabet used (and order of reported metrics): {alphabet}")
    out_fp = open(out_file, "w") if out_file else None
    ms = process_mods_probs(
        np.vstack(all_probs),
        np.concatenate(all_labels),
        allow_unbalanced,
        pct_filt,
        name,
        fp=out_fp,
    )
    if out_fp is not None:
        out_fp.close()
    return ms
