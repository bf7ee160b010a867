"""Duplex modified-base calling.

Reference analog ``src/remora/inference.py:656–1014``: per-strand
simplex calls re-anchored onto the duplex basecall via the native
pairwise aligner, emitted as strand-aware (+/-) MM/ML tags on the duplex
BAM records.
"""

import sys
from collections import defaultdict
from copy import copy
from itertools import chain, islice

import numpy as np

from remora_tpu import constants, log
from remora_tpu.core.pipeline import map_stage
from remora_tpu.core.seq import Motif, revcomp
from remora_tpu.core.tags import format_mm_ml_tags, softmax
from remora_tpu.io.bam import BamWriter, FastBamScanner
from remora_tpu.io.duplex import DuplexPairsBuilder, DuplexRead
from remora_tpu.io.read_index import ReadIndexedBam

LOGGER = log.get_logger()


def call_read_mods(
    read,
    eval_fn,
    model_metadata,
    batch_size=constants.DEFAULT_BATCH_SIZE,
    focus_offset=None,
    return_mm_ml_tags=False,
    return_mod_probs=False,
):
    """Call modified bases on a RemoraRead (public API entry).

    Args:
        read: data.read.RemoraRead
        eval_fn: callable (sigs, enc_kmers) -> logits
        model_metadata: loaded model metadata dict
        focus_offset: call only this base (default: model motif hits)
    """
    if focus_offset is None:
        motifs = [Motif(*mot) for mot in model_metadata["motifs"]]
        read.set_motif_focus_bases(motifs)
    else:
        read.focus_bases = np.array([focus_offset])
    read.prepare_batches(model_metadata, batch_size)
    if not read.batches:
        return np.array([]), np.array([]), np.array([])
    nn_out, labels, pos = read.run_model(eval_fn)
    if not return_mod_probs and not return_mm_ml_tags:
        return nn_out, labels, pos
    probs = softmax(nn_out)[:, 1:].astype(np.float64)
    if return_mm_ml_tags:
        return format_mm_ml_tags(
            seq=read.str_seq,
            poss=pos,
            probs=probs,
            mod_bases=model_metadata["mod_bases"],
            can_base=model_metadata["can_base"],
        )
    return probs, labels, pos


class DuplexReadModCaller:
    def __init__(self, eval_fn, model_metadata):
        self.eval_fn = eval_fn
        self.model_metadata = model_metadata

    def call_duplex_read_mod_probs(self, duplex_read: DuplexRead):
        template_read = duplex_read.template_read.into_remora_read(False)
        complement_read = duplex_read.complement_read.into_remora_read(False)

        template_probs, _, template_positions = call_read_mods(
            read=template_read,
            eval_fn=self.eval_fn,
            model_metadata=self.model_metadata,
            return_mod_probs=True,
        )
        template_positions = template_positions + duplex_read.template_ref_start

        complement_probs, _, complement_positions = call_read_mods(
            read=complement_read,
            eval_fn=self.eval_fn,
            model_metadata=self.model_metadata,
            return_mod_probs=True,
        )
        complement_positions = (
            complement_positions + duplex_read.complement_ref_start
        )

        read_sequence = (
            duplex_read.duplex_basecalled_sequence
            if not duplex_read.is_reverse_mapped
            else revcomp(duplex_read.duplex_basecalled_sequence)
        )
        if duplex_read.is_reverse_mapped:
            (template_positions, template_probs), (
                complement_positions,
                complement_probs,
            ) = (complement_positions, complement_probs), (
                template_positions,
                template_probs,
            )
        complement_positions_duplex_orientation = (
            len(read_sequence) - complement_positions - 1
        )
        return {
            "template_probs": template_probs,
            "template_positions": template_positions,
            "complement_probs": complement_probs,
            "complement_positions": complement_positions_duplex_orientation,
            "read_sequence": read_sequence,
        }

    def call_duplex_read_mods(self, duplex_read: DuplexRead):
        dp = self.call_duplex_read_mod_probs(duplex_read)
        template_mm, template_ml = format_mm_ml_tags(
            seq=dp["read_sequence"],
            poss=dp["template_positions"],
            probs=dp["template_probs"],
            mod_bases=self.model_metadata["mod_bases"],
            can_base=self.model_metadata["can_base"],
            strand="+",
        )
        complement_mm, complement_ml = format_mm_ml_tags(
            seq=dp["read_sequence"],
            poss=dp["complement_positions"],
            probs=dp["complement_probs"],
            mod_bases=self.model_metadata["mod_bases"],
            can_base=revcomp(self.model_metadata["can_base"]),
            strand="-",
        )
        return template_mm + complement_mm, template_ml + complement_ml


class DelimIdConverter:
    """Picklable read-id converter (duplex ids are 'tid;cid')."""

    def __init__(self, delim):
        self.delim = delim

    def __call__(self, read_id):
        return read_id.split(self.delim)[0]


def check_simplex_alignments(*, simplex_index, duplex_index, pairs):
    if len(pairs) == 0:
        raise ValueError("no pairs found in file")
    all_paired = set(chain(*pairs))
    simplex_ids = set(simplex_index.read_ids)
    duplex_ids = set(duplex_index.read_ids)
    n_paired = len(all_paired.intersection(simplex_ids))
    if n_paired == 0:
        raise ValueError("zero simplex alignments found")
    valid = [
        (t, c)
        for t, c in pairs
        if t in simplex_ids and c in simplex_ids and t in duplex_ids
    ]
    LOGGER.debug(f"Found {len(valid)} valid reads out of {len(pairs)} pairs")
    return valid, len(valid)


def prep_duplex_read_builder(simplex_index, pod5_path):
    builder = DuplexPairsBuilder(
        simplex_index=simplex_index, pod5_path=pod5_path
    )
    return [builder], {}


def iter_duplexed_io_reads(read_id_pair, builder):
    return builder.make_read_pair(read_id_pair)


def make_duplex_reads(read_pair_result, duplex_index):
    read_pair, err = read_pair_result
    if err is not None or read_pair is None:
        return read_pair, err
    template, complement = read_pair
    if template.read_id not in duplex_index:
        return read_pair, "duplex BAM record not found for read_id"
    for bam_record in duplex_index.get_alignments(template.read_id):
        duplex_read = DuplexRead.from_reads_and_alignment(
            template_read=template,
            complement_read=complement,
            duplex_alignment=bam_record,
        )
        return duplex_read, None


def add_mod_mappings_to_alignment(duplex_read_result, caller):
    duplex_read, err = duplex_read_result
    if err is not None:
        return None, err
    mm, ml = caller.call_duplex_read_mods(duplex_read)
    record = copy(duplex_read.duplex_alignment)
    record.drop_tags({"MM", "ML"})
    record.set_tag("MM", "Z", mm)
    record.set_tag(
        "ML", "BC", np.frombuffer(ml.tobytes(), dtype=np.uint8)
    )
    return record, None


def infer_duplex(
    *,
    simplex_pod5_path,
    simplex_bam_path,
    duplex_bam_path,
    pairs_path,
    models,
    out_bam,
    num_extract_alignment_threads=1,
    num_duplex_prep_workers=1,
    num_infer_threads=1,
    num_reads=None,
    skip_non_primary=True,
    duplex_deliminator=";",
):
    """Stream duplex reads through per-strand calling into a modBAM.

    Args:
        models: list of (eval_fn, metadata); duplex supports one model.
    """
    first = models[0]
    if hasattr(first, "metadata"):
        eval_fn, model_metadata = first.eval_fn, first.metadata
    else:
        eval_fn, model_metadata = first
    LOGGER.info("Indexing Duplex BAM")
    duplex_bam_index = ReadIndexedBam(
        duplex_bam_path,
        skip_non_primary=skip_non_primary,
        req_tags=set(),
        read_id_converter=DelimIdConverter(duplex_deliminator),
    )
    if duplex_bam_index.num_records == 0:
        LOGGER.info("No records found in duplex BAM file.")
        sys.exit()
    LOGGER.info("Indexing Simplex BAM")
    simplex_bam_index = ReadIndexedBam(
        simplex_bam_path, skip_non_primary=True, req_tags={"mv"}
    )
    if simplex_bam_index.num_records == 0:
        LOGGER.info("No records found in simplex BAM file.")
        sys.exit()
    with open(pairs_path) as fh:
        pairs = [tuple(line.split()) for line in fh if line.strip()]
    valid_pairs, num_valid = check_simplex_alignments(
        simplex_index=simplex_bam_index,
        duplex_index=duplex_bam_index,
        pairs=pairs,
    )
    num_reads = num_valid if num_reads is None else min(num_valid, num_reads)

    io_read_pairs = map_stage(
        iter_duplexed_io_reads,
        islice(valid_pairs, num_reads),
        prep_func=prep_duplex_read_builder,
        args=(simplex_bam_index, simplex_pod5_path),
        name="BuildDuplexedIoReads",
        q_maxsize=100,
        num_workers=num_extract_alignment_threads,
        use_process=True,
    )
    duplex_reads = map_stage(
        make_duplex_reads,
        io_read_pairs,
        num_workers=num_duplex_prep_workers,
        args=(duplex_bam_index,),
        name="MakeDuplexReads",
        q_maxsize=100,
        use_process=True,
    )
    caller = DuplexReadModCaller(eval_fn, model_metadata)
    records = map_stage(
        add_mod_mappings_to_alignment,
        duplex_reads,
        num_workers=num_infer_threads,
        args=(caller,),
        name="InferMods",
        q_maxsize=100,
        use_process=False,
        use_mp_queue=False,
    )

    errs = defaultdict(int)
    in_bam = FastBamScanner(duplex_bam_path)
    n_written = 0
    with BamWriter(out_bam, in_bam.header) as out:
        for record, err in records:
            if err is not None:
                errs[err] += 1
                continue
            out.write(record)
            n_written += 1
    if errs:
        err_str = "\n".join(
            f"{num:>7} : {err:<80}"
            for num, err in sorted(
                ((n, e) for e, n in errs.items()), reverse=True
            )
        )
        LOGGER.info(f"Unsuccessful read reasons:\n{err_str}")
    LOGGER.info(f"Wrote {n_written} duplex records")
    return n_written
