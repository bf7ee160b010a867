"""Streaming modified-base inference: POD5 + BAM -> modBAM.

Reference analog ``src/remora/inference.py:54–653``. Host stages
(signal decode, alignment join, chunk prep, batch assembly, unbatching,
tag formatting) stream through bounded queues; the device stage is one
jitted forward over fixed shapes. Ragged final batches are padded to the
compiled batch size so XLA never recompiles mid-stream.
"""

import array
import os
from collections import defaultdict
from threading import Thread

import jax
import jax.numpy as jnp
import numpy as np

from remora_tpu import RemoraError, constants, log
from remora_tpu.core.pipeline import (
    NamedQueue,
    map_stage,
    put_item,
    queue_iter,
    source_stage,
)
from remora_tpu.core.seq import Motif, revcomp
from remora_tpu.core.tags import format_mm_ml_tags, mods_tags_to_str, softmax
from remora_tpu.core.util import human_format
from remora_tpu.data.dataset import CoreDataset
from remora_tpu.data.metadata import DatasetMetadata
from remora_tpu.io.bam import BamWriter, FastBamScanner
from remora_tpu.io.pod5 import DatasetReader
from remora_tpu.io.read import extract_alignments, iter_signal
from remora_tpu.io.read_index import ReadIndexedBam, get_read_ids

LOGGER = log.get_logger()

# per-stage cProfile hooks (reference analog inference.py:42–46)
_PROF_PREP_FN = os.getenv("REMORA_TPU_INFER_PREP_DATA_PROFILE_FILE")
_PROF_BATCH_FN = os.getenv("REMORA_TPU_INFER_BATCH_PROFILE_FILE")
_PROF_MODEL_FN = os.getenv("REMORA_TPU_INFER_RUN_MODEL_PROFILE_FILE")
_PROF_UNBATCH_FN = os.getenv("REMORA_TPU_INFER_UNBATCH_PROFILE_FILE")


def _maybe_profile(prof_path):
    """Decorator: dump cProfile stats for a pipeline stage when the env
    var for it is set."""

    def outer(func):
        if not prof_path:
            return func

        def wrapper(*args, **kwargs):
            import cProfile

            prof = cProfile.Profile()
            try:
                return prof.runcall(func, *args, **kwargs)
            finally:
                prof.dump_stats(prof_path)

        return wrapper

    return outer


def prepare_reads(read_errs, models_metadata, ref_anchored):
    """Vectorized chunk extraction per read per canonical-base model.

    Produces padded dataset-format arrays directly (data.chunk_batch), no
    per-chunk Python loop — the reference's hottest inference host stage
    (``inference.py:62–137``).
    """
    from remora_tpu.data.chunk_batch import extract_chunks_batch

    motifs = {
        md["can_base"]: [Motif(*mot) for mot in md["motifs"]]
        for md in models_metadata
    }
    prepped = []

    def emit_failure(io_read, why, log_it=True):
        if log_it:
            LOGGER.debug(f"{io_read.child_read_id} {why}")
        prepped.append((io_read, None, why))

    for io_read, err in read_errs:
        if err is not None:
            io_read.prune(drop_move_tag=False)
            prepped.append((io_read, None, err))
            continue
        try:
            remora_read = io_read.into_remora_read(ref_anchored)
        except RemoraError as e:
            io_read.prune(drop_move_tag=False)
            emit_failure(io_read, f"Read prep error: {e}")
            continue
        except Exception as e:
            io_read.prune(drop_move_tag=False)
            emit_failure(io_read, f"Unexpected error: {e}")
            continue
        io_read.prune(drop_move_tag=False)
        per_base_arrays = {}
        for md in models_metadata:
            cb = md["can_base"]
            mdl_read = remora_read.copy()
            mdl_read.set_motif_focus_bases(motifs[cb])
            mdl_read.refine_signal_mapping(md["sig_map_refiner"])
            # per-read padded widths bounded by the chunk width
            result = extract_chunks_batch(
                mdl_read,
                md["chunk_context"],
                md["kmer_context_bases"],
                md["chunk_len"] + 2,
                base_start_justify=md["base_start_justify"],
                offset=md["offset"],
                motifs=motifs[cb],
            )
            if result is None:
                emit_failure(io_read, f"No {cb} mod calls")
                continue
            per_base_arrays[cb] = result[0]
        prepped.append((io_read, per_base_arrays, None))
    return prepped


def prep_nn_input(read_errs, raw=False):
    """Materialize nn inputs per read.

    raw=True passes the compact arrays straight through for on-device
    featurization; raw=False runs the host featurizer (legacy eval fns).
    """
    from remora_tpu.data.encoded_kmers import (
        compute_encoded_kmer_batch as host_enc,
    )

    if not read_errs:
        return [(None, None, "No valid mappings")]
    read_nn_inputs = []
    for io_read, read_arrays, err in read_errs:
        if err is not None:
            read_nn_inputs.append((io_read, None, err))
            continue
        bases_chunks = {}
        for can_base, arrays in read_arrays.items():
            if raw:
                base_chunks = dict(arrays)
                base_chunks.pop("labels", None)
            else:
                # trim the mapping rows so the featurizer sees the true
                # chunk width from row 0 regardless of padding width
                base_chunks = {
                    "signal": arrays["signal"],
                    "enc_kmers": host_enc(
                        *_kcb_from_width(arrays),
                        arrays["sequence"],
                        arrays["sequence_to_signal_mapping"],
                        arrays["sequence_lengths"],
                    ),
                    "read_focus_bases": arrays["read_focus_bases"],
                }
            bases_chunks[can_base] = base_chunks
        read_nn_inputs.append((io_read, bases_chunks, None))
    return read_nn_inputs


def _kcb_from_width(arrays):
    kcb = (
        arrays["sequence"].shape[1]
        - (arrays["sequence_to_signal_mapping"].shape[1] - 1)
    )
    return kcb // 2, kcb - kcb // 2


def batch_reads(prepped_nn_inputs, batches_q, batch_size, models_metadata,
                raw=False):
    """Assemble fixed-size batches spanning read boundaries per can_base.

    Emits (can_base, input_arrays_tuple, read_pos, b_reads); with
    ``raw=True`` the input tuple is (signal, sequence i8, mapping i16,
    seq_lens i32) padded to model-wide widths for on-device
    featurization, else (signal, enc_kmers).
    """
    md_dict = {md["can_base"]: md for md in models_metadata}
    can_bases = list(md_dict)

    def widths(cb):
        md = md_dict[cb]
        # a chunk_len-wide window covers at most chunk_len + 2 bases
        sw = md["chunk_len"] + 2 + sum(md["kmer_context_bases"])
        mw = md["chunk_len"] + 3
        return sw, mw

    def new_arrays(cb):
        md = md_dict[cb]
        if raw:
            sw, mw = widths(cb)
            return (
                np.zeros((batch_size, 1, md["chunk_len"]), dtype=np.float32),
                np.full((batch_size, sw), -1, dtype=np.int8),
                np.zeros((batch_size, mw), dtype=np.int16),
                np.zeros(batch_size, dtype=np.int32),
                np.empty(batch_size, dtype=int),
            )
        return (
            np.empty((batch_size, 1, md["chunk_len"]), dtype=np.float32),
            np.empty(
                (batch_size, md["kmer_len"] * 4, md["chunk_len"]),
                dtype=np.float32,
            ),
            np.empty(batch_size, dtype=int),
        )

    def copy_rows(cb, dst, src, d_st, d_en, s_st, s_en):
        if raw:
            dst[0][d_st:d_en] = src["signal"][s_st:s_en]
            seqs = src["sequence"][s_st:s_en]
            maps = src["sequence_to_signal_mapping"][s_st:s_en]
            dst[1][d_st:d_en, : seqs.shape[1]] = seqs
            dst[2][d_st:d_en, : maps.shape[1]] = maps
            dst[3][d_st:d_en] = src["sequence_lengths"][s_st:s_en]
            dst[-1][d_st:d_en] = src["read_focus_bases"][s_st:s_en]
        else:
            dst[0][d_st:d_en] = src["signal"][s_st:s_en]
            dst[1][d_st:d_en] = src["enc_kmers"][s_st:s_en]
            dst[-1][d_st:d_en] = src["read_focus_bases"][s_st:s_en]

    arrs = {cb: new_arrays(cb) for cb in can_bases}
    b_poss = {cb: 0 for cb in can_bases}
    b_readss = {cb: [] for cb in can_bases}
    for read_nn_inputs in prepped_nn_inputs:
        for io_read, bases_chunks, err in read_nn_inputs:
            if err is not None:
                for cb in can_bases:
                    b_readss[cb].append([io_read, None, None, err])
                continue
            for cb, r_chunks in bases_chunks.items():
                num_chunks = r_chunks["read_focus_bases"].size
                rb_consumed = 0
                while b_poss[cb] + num_chunks - rb_consumed >= batch_size:
                    rb_en = rb_consumed + batch_size - b_poss[cb]
                    copy_rows(
                        cb, arrs[cb], r_chunks, b_poss[cb], batch_size,
                        rb_consumed, rb_en,
                    )
                    b_st = b_poss[cb] if rb_consumed == 0 else None
                    b_readss[cb].append([io_read, b_st, None, None])
                    put_item(
                        (cb, arrs[cb][:-1], arrs[cb][-1], b_readss[cb]),
                        batches_q,
                    )
                    rb_consumed += batch_size - b_poss[cb]
                    arrs[cb] = new_arrays(cb)
                    b_poss[cb] = 0
                    b_readss[cb] = []
                b_en = b_poss[cb] + num_chunks - rb_consumed
                copy_rows(
                    cb, arrs[cb], r_chunks, b_poss[cb], b_en, rb_consumed,
                    num_chunks,
                )
                b_st = b_poss[cb] if rb_consumed == 0 else None
                b_readss[cb].append([io_read, b_st, b_en, None])
                b_poss[cb] = b_en
    for cb in can_bases:
        if b_poss[cb] > 0:
            n = b_poss[cb]
            put_item(
                (
                    cb,
                    tuple(a[:n] for a in arrs[cb][:-1]),
                    arrs[cb][-1][:n],
                    b_readss[cb],
                ),
                batches_q,
            )
    put_item(StopIteration, batches_q)


def run_model_batched(batches_q, called_batches_q, eval_fns, batch_size):
    """Device stage: jitted forward per canonical base, padded last batch."""
    for cb, b_inputs, b_read_pos, b_reads in queue_iter(batches_q):
        n = b_read_pos.size
        if n < batch_size:
            # pad to the compiled shape; slice after
            padded = []
            for arr in b_inputs:
                pad = np.zeros((batch_size,) + arr.shape[1:], dtype=arr.dtype)
                pad[:n] = arr
                padded.append(pad)
            nn_out = np.asarray(eval_fns[cb](*padded))[:n]
        else:
            nn_out = np.asarray(eval_fns[cb](*b_inputs))
        put_item((cb, nn_out, b_read_pos, b_reads), called_batches_q)
    put_item(StopIteration, called_batches_q)


def unbatch_reads(carry, b_nn_out, b_read_pos, b_reads):
    """Reassemble per-read outputs from one batch; ``carry`` holds a read
    still spanning into the next batch."""
    finished = []
    for io_read, b_st, b_en, err in b_reads:
        if err is not None:
            if carry is not None:
                finished.append(carry)
                carry = None
            finished.append((io_read, None, None, err))
            continue
        if b_st is None:
            # continuation rows of the carried read
            if carry is None:
                raise RemoraError("Unbatching encountered None read")
            carried_read, prev_out, prev_pos, _ = carry
            if carried_read.read_id != io_read.read_id:
                raise RemoraError("Unbatching encountered mismatching reads")
            carry = (
                carried_read,
                np.concatenate([prev_out, b_nn_out[:b_en]], axis=0),
                np.concatenate([prev_pos, b_read_pos[:b_en]]),
                None,
            )
            continue
        if carry is not None:
            finished.append(carry)
        carry = (io_read, b_nn_out[b_st:b_en], b_read_pos[b_st:b_en], None)
    return finished, carry


def unbatch(called_batches_q, called_reads_q, models_metadata):
    def get_return_read(reads):
        io_read = reads[-1][1][0]
        mod_calls = [
            (cb, nn_out, r_pos)
            for cb, (_rd, nn_out, r_pos, err) in reads
            if err is None
        ]
        if mod_calls:
            return io_read, mod_calls, None
        seen = sorted({err for _cb, (_rd, _o, _p, err) in reads})
        return io_read, mod_calls, ",".join(seen)

    can_bases = [md["can_base"] for md in models_metadata]
    num_can_bases = len(can_bases)
    curr_reads = {cb: None for cb in can_bases}
    comp_reads = defaultdict(list)
    for cb, nn_out, b_read_pos, b_reads in queue_iter(called_batches_q):
        cb_comp, cb_curr = unbatch_reads(
            curr_reads[cb], nn_out, b_read_pos, b_reads
        )
        curr_reads[cb] = cb_curr
        for comp_read in cb_comp:
            comp_reads[comp_read[0].read_id].append((cb, comp_read))
        full = [
            rid
            for rid, r in comp_reads.items()
            if len(r) == num_can_bases
        ]
        for rid in full:
            put_item(get_return_read(comp_reads[rid]), called_reads_q)
            del comp_reads[rid]
    if curr_reads[can_bases[0]] is not None:
        put_item(
            get_return_read([(cb, curr_reads[cb]) for cb in can_bases]),
            called_reads_q,
        )
    put_item(StopIteration, called_reads_q)


def post_process_reads(read_mapping, models_metadata, ref_anchored):
    """Softmax -> MM/ML tags; optional reference-anchored record rewrite."""
    io_read, mod_calls, err = read_mapping
    if err is not None:
        return io_read, err
    md_dict = {md["can_base"]: md for md in models_metadata}
    mm_tags = []
    ml_arr = array.array("B")
    seq = io_read.ref_seq if ref_anchored else io_read.seq
    for cb, nn_out, r_poss in mod_calls:
        full_probs = softmax(nn_out)
        r_probs = full_probs[:, 1:].astype(np.float64)
        cb_mm, cb_ml = format_mm_ml_tags(
            seq=seq,
            poss=r_poss,
            probs=r_probs,
            mod_bases=md_dict[cb]["mod_bases"],
            can_base=cb,
        )
        mm_tags.append(cb_mm)
        ml_arr.extend(cb_ml)

    rec = io_read.full_align
    rec.set_tag("MM", "Z", "".join(mm_tags))
    rec.set_tag("ML", "BC", np.frombuffer(ml_arr.tobytes(), dtype=np.uint8))
    if ref_anchored:
        rec.cigartuples = [(0, len(io_read.ref_seq))]
        rec.query_sequence = (
            io_read.ref_seq
            if io_read.ref_reg.strand == "+"
            else revcomp(io_read.ref_seq)
        )
        rec.query_qualities = None
    return io_read, None


def infer_from_pod5_and_bam(
    pod5_path,
    in_bam_path,
    models,
    out_bam_path,
    num_reads=None,
    queue_max=1_000,
    num_extract_alignment_workers=1,
    num_prep_read_workers=1,
    num_prep_nn_input_workers=1,
    num_post_process_workers=1,
    batch_size=constants.DEFAULT_BATCH_SIZE,
    skip_non_primary=True,
    ref_anchored=False,
):
    """Run the full streaming inference pipeline.

    Args:
        models: list of ModelHandle (preferred; enables on-device
            featurization from compact raw arrays) or legacy
            (eval_fn(sigs, enc_kmers) -> logits, model_metadata) pairs.
    """
    import sys

    bam_idx = ReadIndexedBam(
        in_bam_path, skip_non_primary=skip_non_primary, req_tags={"mv"}
    )
    if bam_idx.num_records == 0:
        LOGGER.info("No records found in BAM file.")
        sys.exit()
    with DatasetReader(pod5_path) as pod5_dr:
        read_ids, num_reads = get_read_ids(bam_idx, pod5_dr, num_reads)
    raw = all(isinstance(m, ModelHandle) for m in models)
    if raw:
        models_metadata = [m.metadata for m in models]
        eval_fns = {m.metadata["can_base"]: m.eval_raw for m in models}
    else:
        models = [
            m if not isinstance(m, ModelHandle) else (m.eval_fn, m.metadata)
            for m in models
        ]
        models_metadata = [md for _fn, md in models]
        eval_fns = {md["can_base"]: fn for fn, md in models}
    reverse_signal = models_metadata[0]["reverse_signal"]
    pa_scaling = models_metadata[0]["pa_scaling"]

    signals = source_stage(
        iter_signal,
        args=(pod5_path,),
        kwargs={
            "num_reads": num_reads,
            "read_ids": read_ids,
            "rev_sig": reverse_signal,
            "pa_scaling": pa_scaling,
        },
        name="ExtractSignal",
        use_process=True,
        q_maxsize=queue_max,
    )
    reads = map_stage(
        extract_alignments,
        signals,
        name="AddAlignments",
        num_workers=num_extract_alignment_workers,
        args=(bam_idx, reverse_signal),
        q_maxsize=queue_max,
        use_process=True,
    )
    prepped_reads = map_stage(
        prepare_reads,
        reads,
        name="PrepReadData",
        num_workers=num_prep_read_workers,
        args=(models_metadata, ref_anchored),
        q_maxsize=100,
        use_process=True,
    )
    prepped_nn_input = map_stage(
        prep_nn_input,
        prepped_reads,
        num_workers=num_prep_nn_input_workers,
        kwargs={"raw": raw},
        name="PrepNNInput",
        use_process=False,
        use_mp_queue=False,
        q_maxsize=10,
    )
    batches_q = NamedQueue(maxsize=4, name="Batches")
    batch_reads_t = Thread(
        target=_maybe_profile(_PROF_BATCH_FN)(batch_reads),
        args=(
            queue_iter(prepped_nn_input.out_q, num_prep_nn_input_workers),
            batches_q,
            batch_size,
            models_metadata,
            raw,
        ),
        name="batch_reads",
        daemon=True,
    )
    batch_reads_t.start()
    called_batches_q = NamedQueue(maxsize=4, name="CalledBatches")
    call_batches_t = Thread(
        target=_maybe_profile(_PROF_MODEL_FN)(run_model_batched),
        args=(batches_q, called_batches_q, eval_fns, batch_size),
        name="call_batches",
        daemon=True,
    )
    call_batches_t.start()
    called_reads_q = NamedQueue(maxsize=queue_max, name="Unbatch")
    unbatch_t = Thread(
        target=_maybe_profile(_PROF_UNBATCH_FN)(unbatch),
        args=(called_batches_q, called_reads_q, models_metadata),
        name="unbatch",
        daemon=True,
    )
    unbatch_t.start()
    final_reads = map_stage(
        post_process_reads,
        queue_iter(called_reads_q),
        name="PostProcess",
        num_workers=num_post_process_workers,
        args=(models_metadata, ref_anchored),
        q_maxsize=queue_max,
        use_process=False,
        use_mp_queue=False,
    )

    all_qs = [
        signals.out_q,
        reads.out_q,
        prepped_reads.out_q,
        prepped_nn_input.out_q,
        batches_q,
        called_batches_q,
        called_reads_q,
        final_reads.out_q,
    ]
    errs = defaultdict(int)
    for err, cnt in bam_idx.skip_reasons.items():
        errs[err] = cnt
    in_bam = FastBamScanner(in_bam_path)
    sig_called = 0
    n_written = 0
    import time

    t0 = time.monotonic()
    from tqdm import tqdm

    quiet = bool(os.environ.get("LOG_SAFE", False))
    pbar = tqdm(
        desc="Inferring mods",
        total=num_reads,
        unit=" Reads",
        smoothing=0,
        dynamic_ncols=True,
        disable=quiet,
    )
    prev_rid = None
    with BamWriter(out_bam_path, in_bam.header) as out_bam:
        for io_read, err in final_reads:
            LOGGER.debug(
                "QueuesStatus: "
                + "\t".join(
                    f"{q.name}: {q.qsize()}/{q.maxsize}" for q in all_qs
                )
            )
            if io_read is None:
                errs[err] += 1
                pbar.update()
                continue
            if prev_rid != io_read.read_id:
                pbar.update()
            sig_called += io_read.sig_len or 0
            sps, mag = human_format(
                sig_called / max(time.monotonic() - t0, 1e-9)
            )
            pbar.set_postfix_str(f"{sps:>5.1f} {mag}samps/s", refresh=False)
            if err is not None:
                errs[err] += 1
            out_bam.write(io_read.full_align)
            n_written += 1
            prev_rid = io_read.read_id
    pbar.close()
    dt = time.monotonic() - t0
    sps, mag = human_format(sig_called / max(dt, 1e-9))
    LOGGER.info(
        f"Wrote {n_written} records ({sps:.1f} {mag}samples/s)"
    )
    if errs:
        err_str = "\n".join(
            f"{num:>7} : {err:<80}" for num, err in sorted(
                ((n, e) for e, n in errs.items()), reverse=True
            )
        )
        LOGGER.info(f"Unsuccessful read reasons:\n{err_str}")
    batch_reads_t.join()
    call_batches_t.join()
    return n_written


def make_model_eval_fn(model, params, bn_state):
    """Jitted logits fn over fixed shapes for the device stage."""
    from remora_tpu.jax_setup import ensure_compilation_cache

    ensure_compilation_cache()

    @jax.jit
    def _eval(sigs, enc_kmers):
        logits, _ = model.forward(
            params, bn_state, sigs, enc_kmers, train=False
        )
        return logits

    return lambda sigs, enc_kmers: _eval(
        jnp.asarray(sigs), jnp.asarray(enc_kmers)
    )


class ModelHandle:
    """Loaded model + jitted eval paths for the inference device stage.

    ``eval_fn(sigs, enc_kmers)`` consumes host-featurized batches;
    ``eval_raw(sigs, seqs, maps, lens)`` featurizes on device — each
    batch then ships ~50x less data over PCIe/the TPU tunnel, which is
    the dominant cost of the device stage at production batch sizes.
    """

    def __init__(self, model, params, bn_state, metadata):
        self.model = model
        self.params = params
        self.bn_state = bn_state
        self.metadata = metadata
        self.eval_fn = make_model_eval_fn(model, params, bn_state)
        self._raw = None

    def eval_raw(self, sigs, seqs, maps, lens):
        if self._raw is None:
            from remora_tpu.kernels.encoded_kmers import (
                compute_encoded_kmer_batch as dev_enc,
            )

            bb, ab = self.metadata["kmer_context_bases"]
            chunk_len = self.metadata["chunk_len"]
            model, params, bn_state = self.model, self.params, self.bn_state

            @jax.jit
            def _eval(sigs, seqs, maps, lens):
                enc = dev_enc(bb, ab, seqs, maps, lens, chunk_len)
                logits, _ = model.forward(
                    params, bn_state, sigs, enc, train=False
                )
                return logits

            self._raw = _eval
        return self._raw(
            jnp.asarray(sigs),
            jnp.asarray(seqs),
            jnp.asarray(maps),
            jnp.asarray(lens),
        )

    @classmethod
    def load(cls, path):
        from remora_tpu.models import model_io

        model, params, bn_state, meta = model_io.load_model(path)
        return cls(model, params, bn_state, meta)
