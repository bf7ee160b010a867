"""Streaming modified-base inference: POD5 + BAM -> modBAM.

Reference analog ``src/remora/inference.py:54–653``. Host stages
(signal decode, alignment join, chunk prep, batch assembly, unbatching,
tag formatting) stream through bounded queues; the device stage is one
jitted forward over fixed shapes. Ragged final batches are padded to the
compiled batch size so XLA never recompiles mid-stream.
"""

import array
import os
import sys
import time
from collections import defaultdict
from threading import Thread

import jax
import jax.numpy as jnp
import numpy as np

from remora_tpu import RemoraError, constants, log
from remora_tpu.core.pipeline import (
    NamedQueue,
    batch_map_stage,
    map_stage,
    put_item,
    queue_iter,
    source_stage,
)
from remora_tpu.core.seq import Motif, revcomp
from remora_tpu.core.tags import format_mm_ml_tags, mods_tags_to_str, softmax
from remora_tpu.core.util import human_format, pad_rows
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


def _infer_device_sharding(batch_size):
    """(batch_sharding, replicated, device_batch_size) over the local
    devices, or (None, None, batch_size) when the device stage should
    stay single-device.

    The infer device stage is pure data parallelism: every chunk row is
    independent in the eval forward (convs/LSTM read only their own
    row; BatchNorm uses running statistics in eval mode), so splitting
    the batch axis across chips cannot change any per-row value — the
    sharded stage is bit-identical to the single-device one, just N
    chips wide. SURVEY §2.3's inference scale-out plan; reference
    anchor for the single-device pipeline being widened:
    ``src/remora/inference.py:462–659``.

    When ``batch_size`` does not divide over the devices the COMPILED
    batch is padded up to the next multiple (``device_batch_size``);
    batches still carry ``batch_size`` live rows and outputs are sliced
    back, so a user asking for ``--batch-size 1000`` on an 8-chip host
    keeps all 8 chips instead of silently de-scaling to one.

    REMORA_TPU_INFER_DP overrides the device count: 0/1 disables
    sharding, N uses the first N local devices (unset = all local
    devices when more than one is attached).
    """
    import jax

    from remora_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
        replicated,
    )

    devs = jax.local_devices()
    n_req = os.getenv("REMORA_TPU_INFER_DP")
    if n_req is not None:
        n = int(n_req)
        if n <= 1:
            return None, None, batch_size
        if n > len(devs):
            raise RemoraError(
                f"REMORA_TPU_INFER_DP={n} but only {len(devs)} local "
                "devices are attached"
            )
        devs = devs[:n]
    elif len(devs) <= 1:
        return None, None, batch_size
    n_dev = len(devs)
    device_batch_size = -(-batch_size // n_dev) * n_dev
    if device_batch_size != batch_size:
        LOGGER.info(
            f"batch size {batch_size} does not divide over {n_dev} "
            f"local devices; padding device batches to "
            f"{device_batch_size} rows"
        )
    mesh = make_mesh(devs)
    LOGGER.info(
        f"Inference device stage sharded over {n_dev} local devices"
    )
    return data_sharding(mesh), replicated(mesh), device_batch_size


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


def _model_read(remora_read, motifs):
    """Per-model working copy with its motif focus bases selected."""
    mdl_read = remora_read.copy()
    mdl_read.set_motif_focus_bases(motifs)
    return mdl_read


def _model_chunks(mdl_read, md):
    """Padded chunk-array dict for one canonical-base model, or None when
    the read yields no focus hits for its motifs (``mdl_read`` must come
    from ``_model_read``: the extraction skips the motif re-scan on the
    invariant that focus bases were selected from these same motifs)."""
    from remora_tpu.data.chunk_batch import extract_chunks_batch

    # tight per-read row widths (the batch assembler pastes narrower
    # rows into model-wide batches); max_seq_len stays the drop bound.
    # motifs=None: focus bases were JUST selected from these same motifs
    # (set_motif_focus_bases -> findall), and findall hits are interior
    # by construction, so the re-scan mask is identically all-True here
    # (the ETL path keeps it: its focus bases can come from BED files)
    result = extract_chunks_batch(
        mdl_read,
        md["chunk_context"],
        md["kmer_context_bases"],
        md["chunk_len"] + 2,
        base_start_justify=md["base_start_justify"],
        offset=md["offset"],
        motifs=None,
        tight=True,
    )
    return None if result is None else result[0]


def _chunks_for_model(remora_read, md, motifs):
    mdl_read = _model_read(remora_read, motifs)
    mdl_read.refine_signal_mapping(md["sig_map_refiner"])
    return _model_chunks(mdl_read, md)


def prepare_reads(read_errs, models_metadata, ref_anchored):
    """Vectorized chunk extraction per read per canonical-base model.

    Produces padded dataset-format arrays directly (data.chunk_batch), no
    per-chunk Python loop — the reference's hottest inference host stage
    (``inference.py:62–137``).
    """
    motifs = {
        md["can_base"]: [Motif(*mot) for mot in md["motifs"]]
        for md in models_metadata
    }
    prepped = []
    for io_read, err in read_errs:
        if err is None:
            try:
                remora_read = io_read.into_remora_read(ref_anchored)
            except RemoraError as e:
                err = f"Read prep error: {e}"
            except Exception as e:  # noqa: BLE001 — keep the stream alive
                err = f"Unexpected error: {e}"
        io_read.prune(drop_move_tag=False)
        if err is not None:
            LOGGER.debug(f"{io_read.child_read_id} {err}")
            prepped.append((io_read, None, err))
            continue
        per_base_arrays = {}
        for md in models_metadata:
            cb = md["can_base"]
            chunks = _chunks_for_model(remora_read, md, motifs[cb])
            if chunks is None:
                why = f"No {cb} mod calls"
                LOGGER.debug(f"{io_read.child_read_id} {why}")
                prepped.append((io_read, None, why))
            else:
                per_base_arrays[cb] = chunks
        prepped.append((io_read, per_base_arrays, None))
    return prepped


def prepare_reads_batched(batch_read_errs, models_metadata, ref_anchored):
    """``prepare_reads`` over a read micro-batch, with all models' DP
    refinement batched across reads on the device
    (``SigMapRefiner.refine_reads_batch``, refine backend=device).

    Returns one ``prepare_reads``-shaped output list per upstream item
    (the batch_map_stage worker re-flattens them)."""
    motifs = {
        md["can_base"]: [Motif(*mot) for mot in md["motifs"]]
        for md in models_metadata
    }
    outputs = [[] for _ in batch_read_errs]
    # alignment entries in arrival order: [slot, io_read, per_base, errs]
    entries = []
    jobs = []  # (entry, md, mdl_read)
    for slot, read_errs in enumerate(batch_read_errs):
        for io_read, err in read_errs:
            if err is None:
                try:
                    remora_read = io_read.into_remora_read(ref_anchored)
                except RemoraError as e:
                    err = f"Read prep error: {e}"
                except Exception as e:  # noqa: BLE001 — keep stream alive
                    err = f"Unexpected error: {e}"
            io_read.prune(drop_move_tag=False)
            if err is not None:
                LOGGER.debug(f"{io_read.child_read_id} {err}")
                outputs[slot].append((io_read, None, err))
                continue
            entry = [slot, io_read, {}, []]
            entries.append(entry)
            for md in models_metadata:
                jobs.append(
                    (entry, md, _model_read(remora_read, motifs[md["can_base"]]))
                )
    # one batched refine per distinct refiner (models may share one)
    by_refiner = {}
    for job in jobs:
        smr = job[1]["sig_map_refiner"]
        by_refiner.setdefault(id(smr), (smr, []))[1].append(job)
    for smr, ref_jobs in by_refiner.values():
        if smr is None or not smr.is_loaded:
            refine_errs = [None] * len(ref_jobs)
        else:
            refine_errs = smr.refine_reads_batch(
                [mdl_read for _e, _md, mdl_read in ref_jobs]
            )
        for (entry, md, mdl_read), rerr in zip(ref_jobs, refine_errs):
            _slot, io_read, per_base, errs = entry
            cb = md["can_base"]
            if rerr is not None:
                why = f"Read prep error: {rerr}"
                LOGGER.debug(f"{io_read.child_read_id} {why}")
                errs.append(why)
                continue
            chunks = _model_chunks(mdl_read, md)
            if chunks is None:
                why = f"No {cb} mod calls"
                LOGGER.debug(f"{io_read.child_read_id} {why}")
                errs.append(why)
            else:
                per_base[cb] = chunks
    for slot, io_read, per_base, errs in entries:
        for why in errs:
            outputs[slot].append((io_read, None, why))
        outputs[slot].append((io_read, per_base, None))
    return outputs


def _host_featurize(arrays):
    """Legacy eval-fn inputs: host-side one-hot k-mer features."""
    from remora_tpu.data.encoded_kmers import compute_encoded_kmer_batch

    span = (
        arrays["sequence"].shape[1]
        - arrays["sequence_to_signal_mapping"].shape[1]
        + 1
    )
    return {
        "signal": arrays["signal"],
        "enc_kmers": compute_encoded_kmer_batch(
            span // 2,
            span - span // 2,
            arrays["sequence"],
            arrays["sequence_to_signal_mapping"],
            arrays["sequence_lengths"],
        ),
        "read_focus_bases": arrays["read_focus_bases"],
    }


def prep_nn_input(read_errs, raw=False):
    """Materialize nn inputs per read.

    raw=True passes the compact arrays straight through for on-device
    featurization; raw=False runs the host featurizer (legacy eval fns).
    """
    if not read_errs:
        return [(None, None, "No valid mappings")]
    out = []
    for io_read, read_arrays, err in read_errs:
        if err is not None:
            out.append((io_read, None, err))
            continue
        per_base = {}
        for can_base, arrays in read_arrays.items():
            if raw:
                per_base[can_base] = {
                    k: v for k, v in arrays.items() if k != "labels"
                }
            else:
                per_base[can_base] = _host_featurize(arrays)
        out.append((io_read, per_base, None))
    return out


class _BatchAssembler:
    """Fixed-size batch accumulator for one canonical base.

    Rows from successive reads are packed back to back; a read whose
    chunks straddle an emission boundary appears in every batch it
    touches — start offset recorded in the first, ``None`` markers in
    the rest — which is what lets the unbatcher stitch outputs back
    together (reference analog ``inference.py:171–262``).
    """

    def __init__(self, md, batch_size, raw):
        self.md = md
        self.batch_size = batch_size
        self.raw = raw
        self._reset()

    def _reset(self):
        nrows, md = self.batch_size, self.md
        width = md["chunk_len"]
        if self.raw:
            # a width-wide signal window covers at most width + 2 bases
            seq_w = width + 2 + sum(md["kmer_context_bases"])
            self.inputs = (
                np.zeros((nrows, 1, width), np.float32),
                np.full((nrows, seq_w), -1, np.int8),
                np.zeros((nrows, width + 3), np.int16),
                np.zeros(nrows, np.int32),
            )
        else:
            self.inputs = (
                np.empty((nrows, 1, width), np.float32),
                np.empty((nrows, 4 * md["kmer_len"], width), np.float32),
            )
        self.focus = np.empty(nrows, int)
        self.fill = 0
        self.members = []

    def _paste(self, chunks, lo, hi):
        d0, d1 = self.fill, self.fill + (hi - lo)
        self.inputs[0][d0:d1] = chunks["signal"][lo:hi]
        if self.raw:
            seqs = chunks["sequence"][lo:hi]
            maps = chunks["sequence_to_signal_mapping"][lo:hi]
            self.inputs[1][d0:d1, : seqs.shape[1]] = seqs
            self.inputs[2][d0:d1, : maps.shape[1]] = maps
            self.inputs[3][d0:d1] = chunks["sequence_lengths"][lo:hi]
        else:
            self.inputs[1][d0:d1] = chunks["enc_kmers"][lo:hi]
        self.focus[d0:d1] = chunks["read_focus_bases"][lo:hi]

    def note_error(self, io_read, err):
        self.members.append([io_read, None, None, err])

    def add(self, io_read, chunks):
        """Pack one read's rows, yielding each batch they fill."""
        total = chunks["read_focus_bases"].size
        placed = 0
        entry = True
        while self.fill + (total - placed) >= self.batch_size:
            take = self.batch_size - self.fill
            self._paste(chunks, placed, placed + take)
            self.members.append(
                [io_read, self.fill if entry else None, None, None]
            )
            placed += take
            entry = False
            full = (
                self.md["can_base"], self.inputs, self.focus, self.members
            )
            self._reset()
            yield full
        self._paste(chunks, placed, total)
        self.members.append(
            [
                io_read,
                self.fill if entry else None,
                self.fill + (total - placed),
                None,
            ]
        )
        self.fill += total - placed

    def drain(self):
        """The final ragged batch, or None when no rows are pending."""
        if self.fill == 0:
            return None
        live = self.fill
        return (
            self.md["can_base"],
            tuple(a[:live] for a in self.inputs),
            self.focus[:live],
            self.members,
        )


def batch_reads(prepped_nn_inputs, batches_q, batch_size, models_metadata,
                raw=False, stage_h2d=False, in_sharding=None,
                device_batch_size=None):
    """Assemble fixed-size batches spanning read boundaries per can_base.

    Emits (can_base, input_arrays_tuple, read_pos, members); with
    ``raw=True`` the input tuple is (signal, sequence i8, mapping i16,
    seq_lens i32) padded to model-wide widths for on-device
    featurization, else (signal, enc_kmers).

    ``stage_h2d=True`` ships each batch's arrays to the device from THIS
    thread, so host-to-device transfer overlaps the model stage's
    dispatch/fetch loop instead of serializing inside it (the sync h2d
    cost ~12ms/batch on a tunneled link). With ``in_sharding`` set the
    arrays are placed batch-sharded across the inference mesh (batches
    are padded to the compiled ``device_batch_size`` — a multiple of
    the device count — on host first; uneven shards cannot be placed).
    """
    if device_batch_size is None:
        device_batch_size = batch_size
    if stage_h2d:
        import jax

        def emit(b):
            cb, arrs, read_pos, members = b
            if arrs[0].shape[0] != device_batch_size:
                arrs = tuple(pad_rows(a, device_batch_size) for a in arrs)
            arrs = tuple(jax.device_put(a, in_sharding) for a in arrs)
            put_item((cb, arrs, read_pos, members), batches_q)
    else:
        emit = lambda b: put_item(b, batches_q)  # noqa: E731

    packers = {
        md["can_base"]: _BatchAssembler(md, batch_size, raw)
        for md in models_metadata
    }
    for read_nn_inputs in prepped_nn_inputs:
        for io_read, bases_chunks, err in read_nn_inputs:
            if err is not None:
                for packer in packers.values():
                    packer.note_error(io_read, err)
                continue
            for cb, r_chunks in bases_chunks.items():
                for full_batch in packers[cb].add(io_read, r_chunks):
                    emit(full_batch)
    for packer in packers.values():
        tail = packer.drain()
        if tail is not None:
            emit(tail)
    put_item(StopIteration, batches_q)


def run_model_batched(batches_q, called_batches_q, eval_fns,
                      device_batch_size):
    """Device stage: jitted forward per canonical base, padded last batch.

    Dispatch is software-pipelined: jit calls return asynchronously, so
    up to REMORA_TPU_INFER_INFLIGHT (default 2) batches stay in flight
    and the d2h fetch of batch N overlaps the h2d + compute of batch
    N+1. A synchronous per-batch fetch paid the full transfer+compute
    round trip serially (~30ms/batch over a tunneled link, ~30x the
    compute) and made this stage the pipeline bottleneck.
    """
    from collections import deque

    inflight = max(1, int(os.getenv("REMORA_TPU_INFER_INFLIGHT", "2")))
    pending = deque()
    stats = {"batches": 0, "dispatch_s": 0.0, "fetch_s": 0.0,
             "wait_s": 0.0}

    def emit_oldest():
        cb, out, live, b_read_pos, b_reads = pending.popleft()
        t0 = time.monotonic()
        nn_out = np.asarray(out)[:live]
        stats["fetch_s"] += time.monotonic() - t0
        put_item((cb, nn_out, b_read_pos, b_reads), called_batches_q)

    batch_iter = queue_iter(batches_q)
    while True:
        t0 = time.monotonic()
        item = next(batch_iter, None)
        stats["wait_s"] += time.monotonic() - t0
        if item is None:
            break
        cb, b_inputs, b_read_pos, b_reads = item
        live = b_read_pos.size
        if b_inputs[0].shape[0] != device_batch_size:
            # pad up to the compiled shape; slice the outputs back down
            # (the stage-h2d batcher path already ships full-size arrays)
            b_inputs = tuple(
                pad_rows(arr, device_batch_size) for arr in b_inputs
            )
        t0 = time.monotonic()
        out = eval_fns[cb](*b_inputs)
        # start the device->host copy NOW so it overlaps later batches'
        # h2d + compute; the blocking np.asarray at pop time then finds
        # the bytes already resident (the d2h round trip is pure latency
        # on remote links — ~68ms/batch measured — and serializing it
        # per batch bounded the whole stage)
        if hasattr(out, "copy_to_host_async"):
            out.copy_to_host_async()
        stats["dispatch_s"] += time.monotonic() - t0
        stats["batches"] += 1
        pending.append((cb, out, live, b_read_pos, b_reads))
        if len(pending) > inflight:
            emit_oldest()
    while pending:
        emit_oldest()
    if os.getenv("REMORA_TPU_INFER_STAGE_STATS"):
        n = max(stats["batches"], 1)
        LOGGER.info(
            f"Device stage: {stats['batches']} batches, per-batch "
            f"dispatch {stats['dispatch_s'] / n * 1e3:.1f}ms, "
            f"fetch {stats['fetch_s'] / n * 1e3:.1f}ms, "
            f"input-wait {stats['wait_s'] / n * 1e3:.1f}ms"
        )
    put_item(StopIteration, called_batches_q)


class _ReadJoiner:
    """Stitches per-batch output rows back into whole reads, then joins
    each read's results across the canonical-base models."""

    def __init__(self, models_metadata):
        self.can_bases = [md["can_base"] for md in models_metadata]
        # per model: a read whose rows still span into the next batch
        self.open = dict.fromkeys(self.can_bases)
        # read_id -> [(can_base, (io_read, nn_out, positions, err))]
        self.parts = defaultdict(list)

    def feed(self, cb, nn_out, read_pos, members):
        """Absorb one batch; return reads now complete across models."""
        held = self.open[cb]
        closed = []
        for io_read, b_st, b_en, err in members:
            if err is not None:
                if held is not None:
                    closed.append(held)
                    held = None
                closed.append((io_read, None, None, err))
            elif b_st is None:
                # continuation rows of the read carried from last batch
                if held is None:
                    raise RemoraError("Unbatching encountered None read")
                held_read, prev_out, prev_pos, _ = held
                if held_read.read_id != io_read.read_id:
                    raise RemoraError(
                        "Unbatching encountered mismatching reads"
                    )
                held = (
                    held_read,
                    np.concatenate([prev_out, nn_out[:b_en]], axis=0),
                    np.concatenate([prev_pos, read_pos[:b_en]]),
                    None,
                )
            else:
                if held is not None:
                    closed.append(held)
                held = (
                    io_read, nn_out[b_st:b_en], read_pos[b_st:b_en], None
                )
        self.open[cb] = held
        for item in closed:
            self.parts[item[0].read_id].append((cb, item))
        ready = [
            rid
            for rid, got in self.parts.items()
            if len(got) == len(self.can_bases)
        ]
        return [self._join(self.parts.pop(rid)) for rid in ready]

    def flush(self):
        """End-of-stream: the still-open read joined across models."""
        if self.open[self.can_bases[0]] is None:
            return None
        return self._join([(cb, self.open[cb]) for cb in self.can_bases])

    @staticmethod
    def _join(parts):
        io_read = parts[-1][1][0]
        calls = [
            (cb, out, pos)
            for cb, (_rd, out, pos, err) in parts
            if err is None
        ]
        if calls:
            return io_read, calls, None
        reasons = sorted({err for _cb, (_rd, _o, _p, err) in parts})
        return io_read, calls, ",".join(reasons)


def unbatch(called_batches_q, called_reads_q, models_metadata):
    joiner = _ReadJoiner(models_metadata)
    for cb, nn_out, b_read_pos, b_reads in queue_iter(called_batches_q):
        for whole_read in joiner.feed(cb, nn_out, b_read_pos, b_reads):
            put_item(whole_read, called_reads_q)
    leftover = joiner.flush()
    if leftover is not None:
        put_item(leftover, called_reads_q)
    put_item(StopIteration, called_reads_q)


def post_process_reads(read_mapping, models_metadata, ref_anchored):
    """Softmax -> MM/ML tags; optional reference-anchored record rewrite."""
    io_read, mod_calls, err = read_mapping
    if err is not None:
        return io_read, err
    md_dict = {md["can_base"]: md for md in models_metadata}
    seq = io_read.ref_seq if ref_anchored else io_read.seq
    mm_tags = []
    ml_arr = array.array("B")
    for cb, nn_out, r_poss in mod_calls:
        # class-1.. probabilities in f64, as the reference formats them
        mod_probs = softmax(nn_out)[:, 1:].astype(np.float64)
        cb_mm, cb_ml = format_mm_ml_tags(
            seq=seq,
            poss=r_poss,
            probs=mod_probs,
            mod_bases=md_dict[cb]["mod_bases"],
            can_base=cb,
        )
        mm_tags.append(cb_mm)
        ml_arr.extend(cb_ml)

    rec = io_read.full_align
    rec.set_tag("MM", "Z", "".join(mm_tags))
    rec.set_tag("ML", "BC", np.frombuffer(ml_arr.tobytes(), dtype=np.uint8))
    if ref_anchored:
        flat_seq = io_read.ref_seq
        rec.cigartuples = [(0, len(flat_seq))]
        if io_read.ref_reg.strand != "+":
            flat_seq = revcomp(flat_seq)
        rec.query_sequence = flat_seq
        rec.query_qualities = None
    return io_read, None


def _resolve_models(models):
    """Normalize the models argument to (metadata list, eval-fn dict,
    raw flag). Raw mode (all ModelHandle) featurizes on device."""
    raw = all(isinstance(m, ModelHandle) for m in models)
    if raw:
        metadata = [m.metadata for m in models]
        eval_fns = {m.metadata["can_base"]: m.eval_raw for m in models}
    else:
        pairs = [
            (m.eval_fn, m.metadata) if isinstance(m, ModelHandle) else m
            for m in models
        ]
        metadata = [md for _fn, md in pairs]
        eval_fns = {md["can_base"]: fn for fn, md in pairs}
    return metadata, eval_fns, raw


class _InferProgress:
    """tqdm wrapper: per-read ticks + a live samples/s postfix."""

    def __init__(self, num_reads):
        from tqdm import tqdm

        self.t0 = time.monotonic()
        self.samples = 0
        self.last_rid = None
        self.bar = tqdm(
            desc="Inferring mods",
            total=num_reads,
            unit=" Reads",
            smoothing=0,
            dynamic_ncols=True,
            disable=bool(os.environ.get("LOG_SAFE", False)),
        )

    def skipped(self):
        self.bar.update()

    def called(self, io_read):
        if self.last_rid != io_read.read_id:
            self.bar.update()
        self.last_rid = io_read.read_id
        self.samples += io_read.sig_len or 0
        rate, mag = human_format(self.samples / self.elapsed())
        self.bar.set_postfix_str(
            f"{rate:>5.1f} {mag}samps/s", refresh=False
        )

    def elapsed(self):
        return max(time.monotonic() - self.t0, 1e-9)

    def close(self):
        self.bar.close()


def infer_from_pod5_and_bam(
    pod5_path,
    in_bam_path,
    models,
    out_bam_path,
    *,
    num_reads=None,
    queue_max=1_000,
    num_extract_alignment_workers=1,
    num_prep_read_workers=1,
    num_prep_nn_input_workers=1,
    num_post_process_workers=1,
    batch_size=constants.DEFAULT_BATCH_SIZE,
    skip_non_primary=True,
    ref_anchored=False,
    refine_backend=None,
):
    """Run the full streaming inference pipeline.

    Args:
        models: list of ModelHandle (preferred; enables on-device
            featurization from compact raw arrays) or legacy
            (eval_fn(sigs, enc_kmers) -> logits, model_metadata) pairs.
        refine_backend: override the banded-DP execution backend of the
            models' metadata-embedded refiners (auto/native/numpy/
            device). ``device`` replaces the process-parallel read-prep
            stage with a single in-process worker that batches all
            reads' DP refinements into shared Pallas launches.
    """
    # initialize the JAX backend from the MAIN thread before any stage
    # threads start: plugin-registered backends (e.g. the tunneled TPU)
    # race their registration when the first device touch happens on a
    # worker thread, failing with "unknown backend"
    import jax

    jax.devices()

    bam_idx = ReadIndexedBam(
        in_bam_path, skip_non_primary=skip_non_primary, req_tags={"mv"}
    )
    if not bam_idx.num_records:
        LOGGER.info("No records found in BAM file.")
        sys.exit()
    with DatasetReader(pod5_path) as pod5_dr:
        read_ids, num_reads = get_read_ids(bam_idx, pod5_dr, num_reads)

    # multi-host data parallelism: each process streams a disjoint
    # stripe of the reads through its own full pipeline (reads are
    # independent — host-level DP is the natural axis), writes a BAM
    # part, and process 0 merges after a collective barrier
    merged_out_path = None
    if jax.process_count() > 1:
        pid, n_proc = jax.process_index(), jax.process_count()
        # sorted before striding: get_read_ids returns set-ordered ids,
        # which differ across processes under hash randomization; the
        # global num_reads cap applies before the stripe
        read_ids = sorted(read_ids)[:num_reads][pid::n_proc]
        num_reads = len(read_ids)
        merged_out_path = out_bam_path
        out_bam_path = f"{out_bam_path}.part{pid:04d}"
        LOGGER.info(
            f"Process {pid}/{n_proc} infers {num_reads} reads into "
            f"{out_bam_path}"
        )

    # within-host data parallelism: shard the device stage's batches
    # over all local chips (must precede _resolve_models, which binds
    # the eval callables)
    in_sharding, repl_sharding, device_batch_size = _infer_device_sharding(
        batch_size
    )
    if in_sharding is not None:
        for mdl in models:
            if isinstance(mdl, ModelHandle):
                mdl.shard_over(in_sharding, repl_sharding)

    models_metadata, eval_fns, raw = _resolve_models(models)
    if refine_backend in (None, constants.REFINE_BACKEND_AUTO):
        # probe the device link once: 'auto' routes the banded DP to the
        # batched Pallas path on co-located accelerators, host
        # otherwise. IN-PROCESS probe: this driver already holds a live
        # JAX client (jax.devices() above), so a subprocess probe would
        # initialize a second client — which fails under libtpu's
        # exclusive lock on co-located TPU VMs and can wedge tunneled
        # backends
        from remora_tpu.refine.autoselect import (
            probe_device_roundtrip_inprocess,
            resolve_auto_backend,
        )

        refine_backend = resolve_auto_backend(
            [md.get("sig_map_refiner") for md in models_metadata],
            probe=probe_device_roundtrip_inprocess,
        )
    for md in models_metadata:
        if md.get("sig_map_refiner") is not None:
            md["sig_map_refiner"].backend = refine_backend
    device_refine = refine_backend == constants.REFINE_BACKEND_DEVICE

    signals = source_stage(
        iter_signal,
        args=(pod5_path,),
        kwargs=dict(
            read_ids=read_ids,
            num_reads=num_reads,
            pa_scaling=models_metadata[0]["pa_scaling"],
            rev_sig=models_metadata[0]["reverse_signal"],
        ),
        name="ExtractSignal",
        use_process=True,
        q_maxsize=queue_max,
    )
    reads = map_stage(
        extract_alignments,
        signals,
        name="AddAlignments",
        num_workers=num_extract_alignment_workers,
        args=(bam_idx, models_metadata[0]["reverse_signal"]),
        q_maxsize=queue_max,
        use_process=True,
    )
    if device_refine:
        # the device DP stage owns the (single) accelerator: one
        # in-process worker over read micro-batches, DP refinement for
        # the whole batch in shared Pallas launches
        prepped_reads = batch_map_stage(
            prepare_reads_batched,
            reads,
            constants.REFINE_DEVICE_READ_BATCH,
            name="PrepReadData",
            args=(models_metadata, ref_anchored),
            q_maxsize=100,
        )
    else:
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

    stage_errors = {}

    def serial_stage(target, prof_path, out_maxsize, out_name, *extra):
        out_q = NamedQueue(maxsize=out_maxsize, name=out_name)
        wrapped = _maybe_profile(prof_path)(target)

        def guarded(*a):
            # a crashed serial stage must still emit its end sentinel,
            # or every downstream stage (and the main loop) deadlocks;
            # the error is recorded so the driver raises after draining
            try:
                wrapped(*a)
            except BaseException as e:
                LOGGER.exception(
                    f"{target.__name__} stage failed; shutting pipeline "
                    "down"
                )
                stage_errors[target.__name__] = e
                put_item(StopIteration, out_q)
                raise

        th = Thread(
            target=guarded,
            args=extra + (out_q,),
            name=target.__name__,
            daemon=True,
        )
        th.start()
        return out_q, th

    # stage h2d from the batcher thread on accelerators (env override)
    stage_env = os.getenv("REMORA_TPU_INFER_STAGE_H2D")
    if stage_env is not None:
        stage_h2d = stage_env not in ("0", "false", "")
    else:
        stage_h2d = jax.default_backend() != "cpu"

    def _batcher(src, sink):
        batch_reads(src, sink, batch_size, models_metadata, raw,
                    stage_h2d=stage_h2d, in_sharding=in_sharding,
                    device_batch_size=device_batch_size)

    _batcher.__name__ = "batch_reads"
    batches_q, batch_reads_t = serial_stage(
        _batcher,
        _PROF_BATCH_FN,
        4,
        "Batches",
        queue_iter(prepped_nn_input.out_q, num_prep_nn_input_workers),
    )

    def _caller(src, sink):
        run_model_batched(src, sink, eval_fns, device_batch_size)

    _caller.__name__ = "call_batches"
    called_batches_q, call_batches_t = serial_stage(
        _caller, _PROF_MODEL_FN, 4, "CalledBatches", batches_q
    )

    def _joiner(src, sink):
        unbatch(src, sink, models_metadata)

    _joiner.__name__ = "unbatch"
    called_reads_q, _unbatch_t = serial_stage(
        _joiner, _PROF_UNBATCH_FN, queue_max, "Unbatch", called_batches_q
    )

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

    stage_qs = (
        signals.out_q,
        reads.out_q,
        prepped_reads.out_q,
        prepped_nn_input.out_q,
        batches_q,
        called_batches_q,
        called_reads_q,
        final_reads.out_q,
    )

    def queue_status():
        cells = (f"{q.name}: {q.qsize()}/{q.maxsize}" for q in stage_qs)
        return "QueuesStatus: " + "\t".join(cells)

    # REMORA_TPU_INFER_STAGE_STATS=1: sample queue depths on a timer and
    # log an occupancy summary at the end — a stage whose INPUT queue is
    # persistently full while its OUTPUT queue sits empty is the
    # bottleneck (reference analog: per-read queue-status debug lines,
    # inference.py:602–607, which are too verbose to eyeball at scale)
    stats_stop = None
    if os.getenv("REMORA_TPU_INFER_STAGE_STATS"):
        import threading

        stats_stop = threading.Event()
        samples = {q.name: [] for q in stage_qs}

        def _sampler():
            while not stats_stop.wait(0.2):
                for q in stage_qs:
                    samples[q.name].append(q.qsize())

        threading.Thread(
            target=_sampler, name="StageStats", daemon=True
        ).start()

        def _stats_summary():
            lines = []
            for q in stage_qs:
                vals = samples[q.name]
                if not vals:
                    continue
                full_frac = sum(
                    v >= max(q.maxsize, 1) for v in vals
                ) / len(vals)
                empty_frac = sum(v == 0 for v in vals) / len(vals)
                mean_depth = sum(vals) / len(vals)
                lines.append(
                    f"{q.name:<16} mean {mean_depth:8.1f}  "
                    f"empty {empty_frac:5.1%}  full {full_frac:5.1%}"
                )
            return "Stage queue occupancy:\n" + "\n".join(lines)
    else:
        _stats_summary = None

    skip_tally = defaultdict(int, bam_idx.skip_reasons)
    in_bam = FastBamScanner(in_bam_path)
    progress = _InferProgress(num_reads)
    n_written = 0
    with BamWriter(out_bam_path, in_bam.header) as out_bam:
        for io_read, err in final_reads:
            LOGGER.debug(queue_status())
            if io_read is None:
                skip_tally[err] += 1
                progress.skipped()
                continue
            progress.called(io_read)
            if err is not None:
                skip_tally[err] += 1
            out_bam.write(io_read.full_align)
            n_written += 1
    progress.close()
    if stats_stop is not None:
        stats_stop.set()
        LOGGER.info(_stats_summary())
    rate, mag = human_format(progress.samples / progress.elapsed())
    LOGGER.info(f"Wrote {n_written} records ({rate:.1f} {mag}samples/s)")
    if skip_tally:
        by_count = sorted(
            skip_tally.items(), key=lambda kv: kv[1], reverse=True
        )
        lines = (f"{num:>7} : {why:<80}" for why, num in by_count)
        LOGGER.info("Unsuccessful read reasons:\n" + "\n".join(lines))
    # bounded joins: a crashed downstream stage can leave its upstream
    # producer blocked on a full queue (daemon threads, so a timed-out
    # join is safe to abandon) — never hang the driver on it
    batch_reads_t.join(timeout=None if not stage_errors else 10)
    call_batches_t.join(timeout=None if not stage_errors else 10)
    if stage_errors:
        name, err = next(iter(stage_errors.items()))
        raise RemoraError(
            f"inference pipeline stage '{name}' failed after {n_written} "
            f"records were written: {err!r}"
        ) from err
    if merged_out_path is not None:
        n_written = _merge_multihost_parts(
            merged_out_path, n_written, progress.samples
        )
    return n_written


def _merge_multihost_parts(out_bam_path, n_written_local, samples_local):
    """Gather per-host output summaries and merge the per-process BAM
    parts into the final file (SURVEY §2.3: per-read mod-call summaries
    merge via allgather; record payloads stay on disk — only counts ride
    the collective).

    Every process calls this; the allgather doubles as the barrier that
    guarantees all parts are closed before process 0 merges them.
    Returns the GLOBAL written-record count on every process.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    # n_written exact in int32; samples (log line only) in f32 — int64
    # would be silently downcast without the x64 flag
    written = multihost_utils.process_allgather(
        jnp.asarray([n_written_local], jnp.int32)
    )
    samples = multihost_utils.process_allgather(
        jnp.asarray([samples_local], jnp.float32)
    )
    n_written = int(np.asarray(written).sum())
    total_samples = float(np.asarray(samples, np.float64).sum())
    if jax.process_index() == 0:
        part_paths = [
            f"{out_bam_path}.part{pid:04d}"
            for pid in range(jax.process_count())
        ]
        # the merge requires every host's part on THIS filesystem; on a
        # pod without shared output storage the parts live on each
        # host's local disk — leave them in place with a clear message
        # rather than dying with a truncated final BAM (the other
        # processes are waiting at the barrier below either way)
        missing = [p for p in part_paths if not os.path.exists(p)]
        if missing:
            LOGGER.error(
                f"Cannot merge per-host BAM parts: {len(missing)} of "
                f"{len(part_paths)} parts are not visible on this "
                f"host's filesystem (first missing: {missing[0]}). "
                "Multi-host inference needs --out-bam on storage "
                "shared by all hosts, or merge the per-host "
                f"{out_bam_path}.partNNNN files yourself."
            )
        else:
            scanner = FastBamScanner(part_paths[0])
            with BamWriter(out_bam_path, scanner.header) as out_bam:
                for rec in scanner:
                    out_bam.write(rec)
                for part in part_paths[1:]:
                    for rec in FastBamScanner(part):
                        out_bam.write(rec)
            LOGGER.info(
                f"Merged {n_written} records from {len(part_paths)} "
                f"host parts into {out_bam_path} "
                f"({int(total_samples):,} samples called)"
            )
            for part in part_paths:
                os.remove(part)
    # all processes return only after the merged file exists
    multihost_utils.sync_global_devices("remora_tpu_infer_merge_done")
    return n_written


def make_model_eval_fn(model, params, bn_state, compute_dtype=None,
                       in_sharding=None):
    """Jitted logits fn over fixed shapes for the device stage.

    ``compute_dtype`` (e.g. jnp.bfloat16) runs the forward in reduced
    precision (f32 logits out) — ~1.8x device-stage throughput; the
    default f32 path preserves the reference-parity tag bytes.
    ``in_sharding`` batch-shards the inputs over a device mesh (params
    must already be replicated on that mesh) — the data-parallel device
    stage; outputs follow the batch sharding and gather on host fetch.
    """
    from remora_tpu.jax_setup import ensure_compilation_cache

    ensure_compilation_cache()
    params, bn_state = _cast_state(params, bn_state, compute_dtype)

    @jax.jit
    def _eval(sigs, enc_kmers):
        if compute_dtype is not None:
            sigs = sigs.astype(compute_dtype)
            enc_kmers = enc_kmers.astype(compute_dtype)
        logits, _ = model.forward(
            params, bn_state, sigs, enc_kmers, train=False
        )
        return logits.astype(jnp.float32)

    put = _make_put(in_sharding)
    return lambda sigs, enc_kmers: _eval(put(sigs), put(enc_kmers))


def _make_put(in_sharding):
    """Host array -> device array, batch-sharded when a sharding is set.

    Already-committed device arrays (the stage-h2d batcher path) pass
    through untouched — re-putting them would force a copy."""
    if in_sharding is None:
        return jnp.asarray

    def put(x):
        if isinstance(x, jax.Array) and x.committed:
            return x
        return jax.device_put(x, in_sharding)

    return put


def _cast_state(params, bn_state, compute_dtype):
    if compute_dtype is None:
        return params, bn_state
    # jnp (not numpy) leaves: numpy's promotion rules would silently
    # float32-promote bf16 arrays when combined with python scalars
    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jnp.asarray(x).astype(compute_dtype)
        if np.asarray(x).dtype == np.float32
        else jnp.asarray(x),
        t,
    )
    return cast(params), cast(bn_state)


class ModelHandle:
    """Loaded model + jitted eval paths for the inference device stage.

    ``eval_fn(sigs, enc_kmers)`` consumes host-featurized batches;
    ``eval_raw(sigs, seqs, maps, lens)`` featurizes on device — each
    batch then ships ~50x less data over PCIe/the TPU tunnel, which is
    the dominant cost of the device stage at production batch sizes.
    """

    def __init__(self, model, params, bn_state, metadata,
                 compute_dtype=None):
        self.model = model
        self.params = params
        self.bn_state = bn_state
        self.metadata = metadata
        self.compute_dtype = compute_dtype
        self._in_sharding = None
        self._eval = None
        self._raw = None

    def shard_over(self, data_sharding, replicated_sharding):
        """Data-parallel device stage: params replicated over the mesh,
        eval batches split on the leading axis. Row-independent forward
        => logits bit-identical to the single-device stage."""
        self.params = jax.device_put(self.params, replicated_sharding)
        self.bn_state = jax.device_put(self.bn_state, replicated_sharding)
        self._in_sharding = data_sharding
        self._eval = None
        self._raw = None

    @property
    def eval_fn(self):
        if self._eval is None:
            self._eval = make_model_eval_fn(
                self.model, self.params, self.bn_state, self.compute_dtype,
                in_sharding=self._in_sharding,
            )
        return self._eval

    def eval_raw(self, sigs, seqs, maps, lens):
        if self._raw is None:
            from remora_tpu.kernels.encoded_kmers import (
                compute_encoded_kmer_batch as dev_enc,
            )

            bb, ab = self.metadata["kmer_context_bases"]
            chunk_len = self.metadata["chunk_len"]
            model = self.model
            cd = self.compute_dtype
            params, bn_state = _cast_state(self.params, self.bn_state, cd)

            @jax.jit
            def _eval(sigs, seqs, maps, lens):
                # channels-last hot path (featurizer emits (B, W, 4K)
                # for free; towers skip the NCH entry transposes)
                enc = dev_enc(bb, ab, seqs, maps, lens, chunk_len,
                              out_dtype=cd, channels_last=True)
                if cd is not None:
                    sigs = sigs.astype(cd)
                logits, _ = model.forward(
                    params, bn_state, jnp.swapaxes(sigs, 1, 2), enc,
                    train=False, channels_last_in=True,
                )
                return logits.astype(jnp.float32)

            put = _make_put(self._in_sharding)
            self._raw = lambda *arrs: _eval(*(put(a) for a in arrs))
        return self._raw(sigs, seqs, maps, lens)

    @classmethod
    def load(cls, path, compute_dtype=None):
        from remora_tpu.models import model_io

        model, params, bn_state, meta = model_io.load_model(path)
        return cls(model, params, bn_state, meta,
                   compute_dtype=compute_dtype)
