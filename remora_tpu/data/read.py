"""Training/inference read container and chunk extraction.

Reference analogs: ``RemoraRead`` (``src/remora/data_chunks.py:126–540``)
and ``Chunk`` (``:543–641``). Semantics (edge padding, searchsorted
boundary selection, center-of-focus-base chunk anchoring) are preserved
exactly so that golden chunk counts and tensors match.
"""

from dataclasses import dataclass

import numpy as np

from remora_tpu import RemoraError, log
from remora_tpu.core import seq as sequtil

LOGGER = log.get_logger()


@dataclass
class Chunk:
    """One fixed-width training/inference unit.

    Attributes:
        signal: normalized signal, length = sum(chunk_context)
        seq_w_context: int8 sequence including k-mer context bases (-1 pad)
        seq_to_sig_map: int32, len = central seq len + 1, chunk-relative
        kmer_context_bases: (before, after)
        chunk_sig_focus_idx: focus position within chunk signal
        chunk_focus_base: focus base within central chunk sequence
        read_focus_base: focus position within the full read
    """

    signal: np.ndarray
    seq_w_context: np.ndarray
    seq_to_sig_map: np.ndarray
    kmer_context_bases: tuple
    chunk_sig_focus_idx: int
    chunk_focus_base: int
    read_focus_base: int
    read_id: str = None
    label: int = None

    def mask_focus_base(self):
        self.seq_w_context[self.chunk_focus_base + self.kmer_context_bases[0]] = -1

    @property
    def kmer_len(self):
        return sum(self.kmer_context_bases) + 1

    @property
    def seq_len(self):
        return self.seq_w_context.size - sum(self.kmer_context_bases)

    @property
    def seq(self):
        st = self.kmer_context_bases[0]
        return self.seq_w_context[st : st + self.seq_len]

    @property
    def base_sig_lens(self):
        return np.diff(self.seq_to_sig_map)

    def check(self):
        if self.signal.size <= 0:
            raise RemoraError("No signal for chunk")
        if np.any(np.isnan(self.signal)):
            raise RemoraError("Signal contains NaN")
        if (
            self.seq_w_context.size - sum(self.kmer_context_bases)
            != self.seq_to_sig_map.size - 1
        ):
            raise RemoraError("Invalid sig to seq map length")
        if not np.all(np.diff(self.seq_to_sig_map) >= 0):
            LOGGER.debug(
                f"FAILED_CHUNK: not monotonic {self.read_id} "
                f"{self.seq_to_sig_map}"
            )
        if self.seq_to_sig_map[0] < 0:
            raise RemoraError("Seq to sig map starts before 0")
        if self.seq_to_sig_map[-1] > self.signal.size:
            raise RemoraError("Seq to sig map ends after signal")


@dataclass
class RemoraRead:
    """Signal + sequence + mapping for one read.

    Args:
        dacs: unnormalized DAC signal (already reversed for
            reverse-signal chemistries)
        shift/scale: normalization via norm = (dac - shift) / scale
        seq_to_sig_map: signal index per base (+ terminator)
        int_seq / str_seq: encoded / string sequence (one required)
        labels: per-base training label
        focus_bases: positions to extract chunks at
    """

    dacs: np.ndarray
    shift: float
    scale: float
    seq_to_sig_map: np.ndarray
    int_seq: np.ndarray = None
    str_seq: str = None
    read_id: str = None
    labels: np.ndarray = None
    focus_bases: np.ndarray = None
    batches: list = None

    def __post_init__(self):
        if self.int_seq is None:
            if self.str_seq is None:
                raise RemoraError("Must provide sequence to initialize RemoraRead")
            self.int_seq = sequtil.seq_to_int(self.str_seq)
        else:
            self.str_seq = sequtil.int_to_seq(self.int_seq)
        self._sig = None
        self._dwells = None
        self._sig_cumsum = None
        self._base_levels = None

    @classmethod
    def test_read(cls, nbases=20, signal_per_base=10):
        return cls(
            np.zeros(nbases * signal_per_base),
            0.0,
            1.0,
            np.arange(nbases * signal_per_base + 1, step=signal_per_base),
            np.arange(nbases) % 4,
            read_id="test_read",
            labels=np.zeros(nbases, dtype=np.int64),
        )

    @property
    def sig(self):
        if self._sig is None:
            self._sig = ((self.dacs - self.shift) / self.scale).astype(np.float32)
        return self._sig

    @property
    def sig_cumsum(self):
        if self._sig_cumsum is None:
            self._sig_cumsum = np.empty(self.sig.size + 1)
            self._sig_cumsum[0] = 0
            self._sig_cumsum[1:] = np.cumsum(self.sig)
        return self._sig_cumsum

    @property
    def dwells(self):
        if self._dwells is None:
            self._dwells = np.diff(self.seq_to_sig_map)
        return self._dwells

    @property
    def base_levels(self):
        if self._base_levels is None:
            with np.errstate(invalid="ignore"):
                self._base_levels = (
                    np.diff(self.sig_cumsum[self.seq_to_sig_map]) / self.dwells
                )
        return self._base_levels

    def _reset_cache(self):
        self._sig = None
        self._dwells = None
        self._sig_cumsum = None
        self._base_levels = None

    def check(self):
        if self.seq_to_sig_map.size != self.int_seq.size + 1:
            raise RemoraError(
                f"Invalid read: seq ({self.int_seq.size}) and mapping "
                f"({self.seq_to_sig_map.size}) sizes incompatible"
            )
        if self.seq_to_sig_map[0] != 0:
            raise RemoraError("Invalid read: mapping start")
        if self.seq_to_sig_map[-1] != self.sig.size:
            raise RemoraError("Invalid read: mapping end")
        if self.int_seq.size and self.int_seq.max() > 3:
            raise RemoraError("Invalid read: Invalid base")
        if self.int_seq.size and self.int_seq.min() < -1:
            raise RemoraError("Invalid read: Invalid base")

    def copy(self):
        return RemoraRead(
            dacs=self.dacs.copy(),
            shift=self.shift,
            scale=self.scale,
            seq_to_sig_map=self.seq_to_sig_map,
            int_seq=None if self.int_seq is None else self.int_seq.copy(),
            str_seq=self.str_seq,
            read_id=self.read_id,
            labels=None if self.labels is None else self.labels.copy(),
            focus_bases=(
                None if self.focus_bases is None else self.focus_bases.copy()
            ),
        )

    def refine_signal_mapping(self, sig_map_refiner, check_read=False):
        """Apply rough rescale and/or banded-DP mapping refinement."""
        if sig_map_refiner is None or not sig_map_refiner.is_loaded:
            return
        if sig_map_refiner.do_rough_rescale:
            self.shift, self.scale = sig_map_refiner.rough_rescale(
                self.shift,
                self.scale,
                self.seq_to_sig_map,
                self.int_seq,
                self.dacs,
            )
            self._reset_cache()
        if sig_map_refiner.scale_iters >= 0:
            prev_shift, prev_scale = self.shift, self.scale
            try:
                (
                    self.seq_to_sig_map,
                    self.shift,
                    self.scale,
                ) = sig_map_refiner.refine_sig_map(
                    self.shift,
                    self.scale,
                    self.seq_to_sig_map,
                    self.int_seq,
                    self.dacs,
                )
            except IndexError as e:
                LOGGER.debug(f"refine_error {self.read_id} {e}")
            self._reset_cache()
            LOGGER.debug(
                f"Refine mapping ::: shift: {prev_shift} -> {self.shift} "
                f"scale: {prev_scale} -> {self.scale}"
            )
        if check_read:
            self.check()

    def set_motif_focus_bases(self, motifs):
        self.focus_bases = sequtil.find_focus_bases(self.int_seq, motifs)

    def downsample_focus_bases(self, max_sites):
        if self.focus_bases is not None and self.focus_bases.size > max_sites:
            LOGGER.debug(
                f"selected {max_sites} focus bases from "
                f"{self.focus_bases.size} in read {self.read_id}"
            )
            self.focus_bases = np.random.choice(
                self.focus_bases, size=max_sites, replace=False
            )

    def extract_chunk(
        self,
        focus_sig_idx,
        chunk_context,
        kmer_context_bases,
        label=-1,
        read_focus_base=-1,
        check_chunk=False,
        signal_padding=False,
    ):
        chunk_len = sum(chunk_context)
        sig_start = focus_sig_idx - chunk_context[0]
        sig_end = focus_sig_idx + chunk_context[1]
        seq_to_sig_offset = 0
        if sig_start >= 0 and sig_end <= self.sig.size:
            chunk_sig = self.sig[sig_start:sig_end].copy()
        else:
            # read edge: zero-pad (or mirror when signal_padding)
            chunk_sig = np.zeros(chunk_len, dtype=np.float32)
            fill_st = 0
            fill_en = chunk_len
            if sig_start < 0:
                fill_st = -sig_start
                seq_to_sig_offset = -sig_start
                sig_start = 0
            if sig_end > self.sig.size:
                fill_en = self.sig.size - sig_start + seq_to_sig_offset
                sig_end = self.sig.size
            chunk_sig[fill_st:fill_en] = self.sig[sig_start:sig_end]
            if signal_padding:
                chunk_sig[:fill_st] = self.sig[sig_start + fill_st : sig_start : -1]
                chunk_sig[fill_en:] = self.sig[
                    sig_end : sig_end - chunk_sig.size + fill_en - 1 : -1
                ]

        seq_start = (
            np.searchsorted(self.seq_to_sig_map, sig_start, side="right") - 1
        )
        seq_end = np.searchsorted(self.seq_to_sig_map, sig_end, side="left")

        chunk_seq_to_sig = self.seq_to_sig_map[seq_start : seq_end + 1].copy()
        chunk_seq_to_sig -= sig_start - seq_to_sig_offset
        chunk_seq_to_sig[0] = 0
        chunk_seq_to_sig[-1] = chunk_len
        chunk_seq_to_sig = chunk_seq_to_sig.astype(np.int32)

        kmer_before_bases, kmer_after_bases = kmer_context_bases
        if (
            seq_start >= kmer_before_bases
            and seq_end + kmer_after_bases <= self.int_seq.size
        ):
            chunk_seq = self.int_seq[
                seq_start - kmer_before_bases : seq_end + kmer_after_bases
            ]
        else:
            chunk_seq = np.full(
                seq_end - seq_start + sum(kmer_context_bases), -1, dtype=np.int8
            )
            fill_st = 0
            fill_en = seq_end - seq_start + sum(kmer_context_bases)
            chunk_seq_st = seq_start - kmer_before_bases
            chunk_seq_en = seq_end + kmer_after_bases
            if seq_start < kmer_before_bases:
                fill_st = kmer_before_bases - seq_start
                chunk_seq_st = 0
            if seq_end + kmer_after_bases > self.int_seq.size:
                fill_en -= seq_end + kmer_after_bases - self.int_seq.size
                chunk_seq_en = self.int_seq.size
            chunk_seq[fill_st:fill_en] = self.int_seq[chunk_seq_st:chunk_seq_en]
        chunk = Chunk(
            signal=chunk_sig,
            seq_w_context=chunk_seq,
            seq_to_sig_map=chunk_seq_to_sig,
            kmer_context_bases=kmer_context_bases,
            chunk_sig_focus_idx=focus_sig_idx - sig_start,
            chunk_focus_base=read_focus_base - seq_start,
            read_focus_base=read_focus_base,
            read_id=self.read_id,
            label=label,
        )
        if check_chunk:
            chunk.check()
        return chunk

    def iter_chunks(
        self,
        chunk_context,
        kmer_context_bases,
        base_start_justify=False,
        offset=0,
        check_chunks=False,
        motifs=None,
    ):
        for focus_base in self.focus_bases:
            if motifs is not None:
                if not any(
                    motif.match(self.int_seq, focus_base) for motif in motifs
                ):
                    LOGGER.debug("FAILED_MOTIF_CHECK")
                    continue
            label = -1 if self.labels is None else self.labels[focus_base]
            focus_base = max(
                min(focus_base + offset, self.seq_to_sig_map.size - 2), 0
            )
            if base_start_justify:
                focus_sig_idx = self.seq_to_sig_map[focus_base]
            else:
                focus_sig_idx = (
                    self.seq_to_sig_map[focus_base]
                    + self.seq_to_sig_map[focus_base + 1]
                ) // 2
            try:
                yield self.extract_chunk(
                    focus_sig_idx,
                    chunk_context,
                    kmer_context_bases,
                    label=label,
                    read_focus_base=focus_base,
                    check_chunk=check_chunks,
                )
            except RemoraError as e:
                LOGGER.debug(f"FAILED_CHUNK_CHECK {e}")
            except Exception as e:
                LOGGER.debug(f"FAILED_CHUNK_EXTRACT {e}")

    def prepare_batches(self, model_metadata, batch_size):
        """Prepare device-ready batches of this read's chunks.

        Reference analog ``data_chunks.py:468–514`` — builds an in-memory
        dataset so chunk tensor assembly is identical to training prep.
        """
        from remora_tpu.data.dataset import CoreDataset
        from remora_tpu.data.metadata import DatasetMetadata

        self.batches = []
        self.refine_signal_mapping(model_metadata["sig_map_refiner"])
        chunks = list(
            self.iter_chunks(
                model_metadata["chunk_context"],
                model_metadata["kmer_context_bases"],
                model_metadata["base_start_justify"],
                model_metadata["offset"],
            )
        )
        if len(chunks) == 0:
            return
        motif_seqs, motif_offsets = zip(*model_metadata["motifs"])
        dataset = CoreDataset(
            mode="w",
            metadata=DatasetMetadata(
                allocate_size=len(chunks),
                max_seq_len=max(c.seq_len for c in chunks),
                mod_bases=model_metadata["mod_bases"],
                mod_long_names=model_metadata["mod_long_names"],
                motif_sequences=list(motif_seqs),
                motif_offsets=list(motif_offsets),
                chunk_context=model_metadata["chunk_context"],
                kmer_context_bases=model_metadata["kmer_context_bases"],
                extra_arrays={"read_focus_bases": ("int64", "")},
            ),
            batch_size=batch_size,
            super_batch_size=len(chunks),
            infinite_iter=False,
        )
        for chunk in chunks:
            dataset.write_chunk(chunk)
        for batch in dataset:
            self.batches.append(
                (
                    batch["signal"],
                    batch["enc_kmers"],
                    batch["labels"],
                    batch["read_focus_bases"],
                )
            )

    def run_model(self, eval_fn):
        """Call modified bases over prepared batches.

        Args:
            eval_fn: callable (sigs, enc_kmers) -> logits. Ragged batches
                are padded to power-of-two bucket shapes so a jitted
                eval_fn compiles a bounded number of variants.

        Returns:
            (outputs (ncalls, nlab), labels, read positions)
        """
        read_outputs, read_poss, read_labels = [], [], []
        for sigs, enc_kmers, labels, read_pos in self.batches:
            n = sigs.shape[0]
            bucket = 1 << max(0, (n - 1)).bit_length()
            if bucket != n:
                pad_s = np.zeros((bucket,) + sigs.shape[1:], sigs.dtype)
                pad_k = np.zeros(
                    (bucket,) + enc_kmers.shape[1:], enc_kmers.dtype
                )
                pad_s[:n] = sigs
                pad_k[:n] = enc_kmers
                out = np.asarray(eval_fn(pad_s, pad_k))[:n]
            else:
                out = np.asarray(eval_fn(sigs, enc_kmers))
            read_outputs.append(out)
            read_labels.append(labels)
            read_poss.append(read_pos)
        return (
            np.concatenate(read_outputs, axis=0),
            np.concatenate(read_labels),
            np.concatenate(read_poss),
        )
