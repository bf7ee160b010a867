"""IO-side read: signal, basecalls, scaling domains, reference alignment.

Reference analog: ``io.Read`` (``src/remora/io.py:1746–2479``). Carries
the three scaling domains (pA, zero-centered pA, norm), parses move
table + trim/scaling BAM tags, computes ref_to_signal through the CIGAR,
and bridges into the data-layer RemoraRead.
"""

from copy import copy, deepcopy
from dataclasses import dataclass

import numpy as np

from remora_tpu import RemoraError, log
from remora_tpu.constants import PA_TO_NORM_SCALING_FACTOR
from remora_tpu.core import coords, seq as sequtil
from remora_tpu.core.metrics import METRIC_FUNCS
from remora_tpu.data.read import RemoraRead
from remora_tpu.io.refregion import RefRegion

LOGGER = log.get_logger()


@dataclass
class ReadRefReg:
    read_id: str
    norm_signal: np.ndarray
    seq: str
    seq_to_sig_map: np.ndarray
    ref_reg: RefRegion
    sig_start: int = 0


@dataclass
class ReadBasecallRegion:
    read_id: str
    norm_signal: np.ndarray
    seq: str
    seq_to_sig_map: np.ndarray
    start: int
    sig_start: int = 0


@dataclass
class Read:
    """All scaling parameters follow output = (input - shift) / scale."""

    read_id: str
    dacs: np.ndarray = None
    seq: str = None
    stride: int = None
    mv_table: np.ndarray = None
    query_to_signal: np.ndarray = None
    shift_dacs_to_pa: float = None
    scale_dacs_to_pa: float = None
    shift_pa_to_norm: float = None
    scale_pa_to_norm: float = None
    shift_dacs_to_norm: float = None
    scale_dacs_to_norm: float = None
    shift_pa_to_zc_pa: float = None
    scale_pa_to_zc_pa: float = None
    ref_seq: str = None
    ref_reg: RefRegion = None
    cigar: list = None
    ref_to_signal: np.ndarray = None
    full_align: object = None  # BamRecord of the originating alignment
    _child_read_id: str = None
    _sig_len: int = None

    # --- scaling domains ---
    @property
    def pa_signal(self):
        if self.scale_dacs_to_pa is None or self.shift_dacs_to_pa is None:
            raise RemoraError("pA scaling factors not set")
        return (self.dacs - self.shift_dacs_to_pa) / self.scale_dacs_to_pa

    @property
    def zero_centered_pa_signal(self):
        return (self.dacs - self.shift_dacs_to_zc_pa) / self.scale_dacs_to_zc_pa

    @property
    def norm_signal(self):
        if self.scale_dacs_to_norm is None or self.shift_dacs_to_norm is None:
            raise RemoraError("Norm scaling factors not set")
        return (self.dacs - self.shift_dacs_to_norm) / self.scale_dacs_to_norm

    def compute_pa_to_norm_scaling(self, factor=PA_TO_NORM_SCALING_FACTOR):
        self.shift_pa_to_norm = np.median(self.pa_signal)
        self.scale_pa_to_norm = max(
            1.0,
            np.median(np.abs(self.pa_signal - self.shift_pa_to_norm)) * factor,
        )

    @property
    def sig_len(self):
        if self._sig_len is None and self.dacs is not None:
            self._sig_len = self.dacs.size
        return self._sig_len

    @property
    def seq_len(self):
        if self.query_to_signal is None:
            return None if self.seq is None else len(self.seq)
        return self.query_to_signal.size - 1

    @property
    def ref_seq_len(self):
        if self.ref_to_signal is None:
            return None if self.ref_seq is None else len(self.ref_seq)
        return self.ref_to_signal.size - 1

    @property
    def child_read_id(self):
        return self.read_id if self._child_read_id is None else self._child_read_id

    @property
    def shift_dacs_to_zc_pa(self):
        if (
            self.shift_dacs_to_pa is None
            or self.scale_dacs_to_pa is None
            or self.shift_pa_to_zc_pa is None
        ):
            raise RemoraError("Zero-centered pA scaling factors not set")
        return self.shift_dacs_to_pa + (
            self.scale_dacs_to_pa * self.shift_pa_to_zc_pa
        )

    @property
    def scale_dacs_to_zc_pa(self):
        if self.scale_dacs_to_pa is None or self.scale_pa_to_zc_pa is None:
            raise RemoraError("Zero-centered pA scaling factors not set")
        return self.scale_dacs_to_pa * self.scale_pa_to_zc_pa

    def prune(self, drop_mod_tags=True, drop_move_tag=True):
        """Drop large arrays once chunks have been extracted."""
        drop_tags = set()
        if drop_mod_tags:
            drop_tags.update(("MM", "ML"))
        if drop_move_tag:
            drop_tags.add("mv")
        if drop_tags and self.full_align is not None:
            self.full_align.drop_tags(drop_tags)
        self.sig_len  # cache before dropping
        self.dacs = None
        self.mv_table = None
        self.query_to_signal = None
        self.ref_to_signal = None
        return self

    # --- alignment ---
    def add_alignment(
        self,
        alignment_record,
        parse_ref_align=True,
        reverse_signal=False,
        pa_scaling=None,
    ):
        """Attach a BamRecord: trims, move table, scaling tags, ref mapping."""
        if pa_scaling is not None:
            self.shift_pa_to_zc_pa = pa_scaling[0]
            self.scale_pa_to_zc_pa = pa_scaling[1]
        if alignment_record.reference_name is None and alignment_record.is_reverse:
            raise RemoraError("Unmapped reads cannot map to reverse strand.")
        if self.dacs is None:
            raise RemoraError("Must add signal to io.Read before alignment.")
        self.full_align = alignment_record

        tags = alignment_record.tag_dict()
        if reverse_signal:
            self.dacs = self.dacs[::-1]
        # split-read and adapter trims
        self.dacs = self.dacs[tags.get("sp", 0) :]
        self.dacs = self.dacs[tags.get("ts", 0) : tags.get("ns", self.dacs.size)]
        if reverse_signal:
            self.dacs = self.dacs[::-1]
        self._sig_len = None

        parent_read_id = tags.get("pi", None)
        if parent_read_id is None:
            if alignment_record.query_name != self.read_id:
                raise RemoraError("Read IDs mismatch")
        else:
            if parent_read_id != self.read_id:
                raise RemoraError("Split read IDs mismatch")
            self._child_read_id = alignment_record.query_name

        self.seq = alignment_record.query_sequence
        if alignment_record.is_reverse:
            self.seq = sequtil.revcomp(self.seq)
        if "mv" in tags:
            mv_tag = tags["mv"]
            self.stride = int(mv_tag[0])
            self.mv_table = np.asarray(mv_tag[1:])
            self.query_to_signal = coords.parse_move_table(
                self.stride,
                self.mv_table,
                sig_len=self.sig_len,
                seq_len=len(self.seq),
                reverse_signal=reverse_signal,
            )
        else:
            LOGGER.debug(f"Move table not found for {self.child_read_id}")
            self.query_to_signal = self.mv_table = self.stride = None

        if "sm" in tags and "sd" in tags:
            self.shift_pa_to_norm = tags["sm"]
            self.scale_pa_to_norm = tags["sd"]
        else:
            self.compute_pa_to_norm_scaling()
        self.shift_dacs_to_norm = self.shift_dacs_to_pa + (
            self.scale_dacs_to_pa * self.shift_pa_to_norm
        )
        self.scale_dacs_to_norm = self.scale_dacs_to_pa * self.scale_pa_to_norm

        if not parse_ref_align or alignment_record.is_unmapped:
            return

        self.ref_reg = RefRegion(
            ctg=alignment_record.reference_name,
            strand="-" if alignment_record.is_reverse else "+",
            start=alignment_record.reference_start,
        )
        try:
            self.ref_seq = alignment_record.get_reference_sequence().upper()
        except (ValueError, KeyError):
            LOGGER.debug(
                "Reference sequence requested, but could not be extracted. "
                "Do reads contain MD tags?"
            )
            self.ref_seq = None
        self.cigar = alignment_record.cigartuples
        if alignment_record.is_reverse:
            if self.ref_seq is not None:
                self.ref_seq = sequtil.revcomp(self.ref_seq)
            self.cigar = self.cigar[::-1]
        if (
            self.ref_reg.ctg is not None
            and self.ref_seq is not None
            and self.query_to_signal is not None
        ):
            self.ref_to_signal = coords.compute_ref_to_signal(
                query_to_signal=self.query_to_signal, cigar=self.cigar
            )
            if self.ref_to_signal.size != len(self.ref_seq) + 1:
                raise RemoraError("Discordant ref seq lengths")
            self.ref_reg.end = self.ref_reg.start + self.ref_to_signal.size - 1

    @classmethod
    def from_pod5_and_alignment(
        cls, pod5_read_record, alignment_record, reverse_signal=False,
        pa_scaling=None,
    ):
        dacs = pod5_read_record.signal
        if reverse_signal:
            dacs = dacs[::-1]
        # remora_tpu Calibration is already in (x - shift) / scale form
        read = cls(
            read_id=str(pod5_read_record.read_id),
            dacs=dacs,
            shift_dacs_to_pa=pod5_read_record.calibration.offset,
            scale_dacs_to_pa=pod5_read_record.calibration.scale,
        )
        read.add_alignment(
            alignment_record, reverse_signal=reverse_signal, pa_scaling=pa_scaling
        )
        return read

    def into_remora_read(self, use_reference_anchor):
        """Extract the data-layer RemoraRead (ref- or basecall-anchored)."""
        if use_reference_anchor:
            if self.ref_to_signal is None:
                if self.cigar is None or self.ref_seq is None:
                    raise RemoraError("Missing reference alignment")
                self.ref_to_signal = coords.compute_ref_to_signal(
                    self.query_to_signal, self.cigar
                )
                if self.ref_to_signal.size != len(self.ref_seq) + 1:
                    raise RemoraError("Discordant ref seq lengths")
            trim_dacs = self.dacs[self.ref_to_signal[0] : self.ref_to_signal[-1]]
            shift_seq_to_sig = self.ref_to_signal - self.ref_to_signal[0]
            seq = self.ref_seq
        else:
            if self.query_to_signal is None:
                raise RemoraError("Missing query_to_signal (move table)")
            trim_dacs = self.dacs[
                self.query_to_signal[0] : self.query_to_signal[-1]
            ]
            shift_seq_to_sig = self.query_to_signal - self.query_to_signal[0]
            seq = self.seq
        if self.shift_pa_to_zc_pa is None or self.scale_pa_to_zc_pa is None:
            scale_kwargs = {
                "shift": self.shift_dacs_to_norm,
                "scale": self.scale_dacs_to_norm,
            }
        else:
            scale_kwargs = {
                "shift": self.shift_dacs_to_zc_pa,
                "scale": self.scale_dacs_to_zc_pa,
            }
        remora_read = RemoraRead(
            dacs=trim_dacs,
            seq_to_sig_map=shift_seq_to_sig,
            str_seq=seq,
            read_id=self.read_id,
            **scale_kwargs,
        )
        remora_read.check()
        return remora_read

    def set_refine_signal_mapping(self, sig_map_refiner, ref_mapping=False):
        """Refine the basecall- or reference-anchored signal mapping in place."""
        if sig_map_refiner is None:
            return
        remora_read = self.into_remora_read(ref_mapping)
        remora_read.refine_signal_mapping(sig_map_refiner)
        if ref_mapping:
            if self.ref_to_signal is None:
                raise RemoraError("Missing ref_to_signal (move table)")
            self.ref_to_signal = remora_read.seq_to_sig_map + self.ref_to_signal[0]
        else:
            if self.query_to_signal is None:
                raise RemoraError("Missing query_to_signal (move table)")
            self.query_to_signal = (
                remora_read.seq_to_sig_map + self.query_to_signal[0]
            )
        self.shift_dacs_to_norm = remora_read.shift
        self.scale_dacs_to_norm = remora_read.scale
        self.shift_pa_to_norm = (
            self.shift_dacs_to_norm - self.shift_dacs_to_pa
        ) / self.scale_dacs_to_pa
        self.scale_pa_to_norm = self.scale_dacs_to_norm / self.scale_dacs_to_pa

    # --- focus position selection ---
    def get_filtered_focus_positions(self, select_focus_positions):
        """Read-relative positions from a (ctg, strand)->set lookup."""
        if self.ref_reg is None or self.ref_seq is None:
            raise RemoraError("Cannot extract focus positions without mapping")
        ref_reg = self.ref_reg
        ref_len = len(self.ref_seq)
        try:
            cs_focus_pos = select_focus_positions[(ref_reg.ctg, ref_reg.strand)]
        except KeyError:
            return np.array([], dtype=int)
        read_focus_ref_reg = np.array(
            sorted(
                set(range(ref_reg.start, ref_reg.start + ref_len)).intersection(
                    cs_focus_pos
                )
            ),
            dtype=int,
        )
        return (
            read_focus_ref_reg - ref_reg.start
            if ref_reg.strand == "+"
            else ref_reg.start + ref_len - read_focus_ref_reg[::-1] - 1
        )

    def get_basecall_anchored_focus_bases(
        self, motifs, select_focus_reference_positions
    ):
        """Basecall positions whose reference mates hit a motif/BED site."""
        if self.cigar is None:
            raise RemoraError("missing alignment")
        basecall_int_seq = sequtil.seq_to_int(self.seq)
        reference_int_seq = sequtil.seq_to_int(self.ref_seq)
        all_bc_focus = sequtil.find_focus_bases(basecall_int_seq, motifs)
        mapping = coords.make_sequence_coordinate_mapping(self.cigar).astype(int)
        ref_motif_pos = (
            sequtil.find_focus_bases(reference_int_seq, motifs)
            if select_focus_reference_positions is None
            else self.get_filtered_focus_positions(
                select_focus_reference_positions
            )
        )
        ref_supported = mapping[ref_motif_pos]
        return np.array([fb for fb in all_bc_focus if fb in ref_supported])

    def copy(self):
        return deepcopy(self)

    # --- region extraction / metrics ---
    def get_sig_type(self, signal_type):
        if signal_type == "norm":
            return self.norm_signal
        if signal_type == "pa":
            return self.pa_signal
        if signal_type == "zc_pa":
            return self.zero_centered_pa_signal
        if signal_type == "dac":
            return self.dacs
        raise RemoraError(f"Invalid signal_type: {signal_type}")

    def extract_basecall_region(self, start_base=None, end_base=None,
                                signal_type="norm"):
        if self.query_to_signal is None:
            raise RemoraError("Missing query_to_signal (move table)")
        start_base = start_base or 0
        end_base = end_base or self.seq_len
        reg_seq_to_sig = self.query_to_signal[start_base : end_base + 1].copy()
        reg_sig = self.get_sig_type(signal_type)[
            reg_seq_to_sig[0] : reg_seq_to_sig[-1]
        ]
        sig_start = reg_seq_to_sig[0]
        reg_seq_to_sig -= sig_start
        return ReadBasecallRegion(
            read_id=self.read_id,
            norm_signal=reg_sig,
            seq=self.seq[start_base:end_base],
            seq_to_sig_map=reg_seq_to_sig,
            start=start_base,
            sig_start=sig_start,
        )

    def extract_ref_reg(self, ref_reg, signal_type="norm"):
        if self.ref_to_signal is None:
            raise RemoraError("Missing ref_to_signal (move table)")
        if ref_reg.start >= self.ref_reg.start + self.ref_seq_len:
            raise RemoraError("Reference region starts after read ends")
        if ref_reg.end < self.ref_reg.start:
            raise RemoraError("Reference region ends before read starts")

        if self.ref_reg.strand == "+":
            st_within = max(0, ref_reg.start - self.ref_reg.start)
            en_within = ref_reg.end - self.ref_reg.start
        else:
            st_within = max(0, self.ref_reg.end - ref_reg.end)
            en_within = self.ref_reg.end - ref_reg.start
        reg_seq_to_sig = self.ref_to_signal[st_within : en_within + 1].copy()
        reg_sig = self.get_sig_type(signal_type)[
            reg_seq_to_sig[0] : reg_seq_to_sig[-1]
        ]
        reg_seq = self.ref_seq[st_within:en_within]
        sig_start = reg_seq_to_sig[0]
        reg_seq_to_sig -= sig_start
        read_reg_ref_st = max(self.ref_reg.start, ref_reg.start)
        if self.ref_reg.strand == "-":
            reg_sig = reg_sig[::-1]
            reg_seq = reg_seq[::-1]
            reg_seq_to_sig = reg_seq_to_sig[-1] - reg_seq_to_sig[::-1]
        return ReadRefReg(
            read_id=self.read_id,
            norm_signal=reg_sig,
            seq=reg_seq,
            seq_to_sig_map=reg_seq_to_sig,
            ref_reg=RefRegion(
                self.ref_reg.ctg,
                self.ref_reg.strand,
                read_reg_ref_st,
                read_reg_ref_st + len(reg_seq),
            ),
            sig_start=sig_start,
        )

    def compute_per_base_metric(
        self,
        metric=None,
        metric_func=None,
        ref_anchored=True,
        region=None,
        signal_type="norm",
        **kwargs,
    ):
        if metric is not None:
            metric_func = METRIC_FUNCS[metric]
        if metric_func is None:
            raise RemoraError("Must provide either metric or metric_func")
        st_buf = en_buf = 0
        if region is None:
            seq_to_sig = (
                self.ref_to_signal if ref_anchored else self.query_to_signal
            )
            if seq_to_sig is None:
                raise RemoraError("Missing move table")
        else:
            if ref_anchored:
                if self.ref_to_signal is None:
                    raise RemoraError("Missing ref_to_signal (move table)")
                if (
                    self.ref_reg.ctg != region.ctg
                    or self.ref_reg.strand != region.strand
                ):
                    raise RemoraError("Region contig/strand do not match read")
                if (
                    region.start >= self.ref_reg.end
                    or self.ref_reg.start >= region.end
                ):
                    raise RemoraError("Region does not overlap read.")
                if self.ref_reg.strand == "+":
                    st_coord = region.start - self.ref_reg.start
                    en_coord = region.end - self.ref_reg.start
                else:
                    st_coord = self.ref_reg.end - region.end
                    en_coord = self.ref_reg.end - region.start
                if st_coord < 0:
                    st_buf = -st_coord
                    st_coord = 0
                if en_coord > self.ref_seq_len:
                    en_buf = en_coord - self.ref_seq_len
                    en_coord = self.ref_seq_len
                seq_to_sig = self.ref_to_signal[st_coord : en_coord + 1]
            else:
                if self.query_to_signal is None:
                    raise RemoraError("Missing query_to_signal (move table)")
                if region.start < 0 or region.start > self.seq_len:
                    raise RemoraError("Region does not overlap read.")
                seq_to_sig = self.query_to_signal[region.start : region.end]
        sig = self.get_sig_type(signal_type)
        metrics_vals = metric_func(sig, seq_to_sig, **kwargs)
        if max(st_buf, en_buf) > 0:
            padded = {}
            for name, vals in metrics_vals.items():
                padded[name] = np.full(region.len, np.nan)
                padded[name][st_buf : st_buf + vals.size] = vals
            metrics_vals = padded
        return metrics_vals

    def with_duplex_alignment(self, duplex_read_alignment, duplex_orientation):
        """Copy re-anchored onto a duplex basecall (see remora_tpu.io.duplex)."""
        from remora_tpu.io import duplex as duplex_mod

        if self.query_to_signal is None:
            raise RemoraError("requires query_to_signal")
        if duplex_read_alignment.query_sequence is None:
            raise RemoraError("no duplex base call sequence?")
        if len(duplex_read_alignment.query_sequence) <= 0:
            raise RemoraError("duplex base call sequence is empty string?")

        read = copy(self)
        duplex_read_sequence = (
            duplex_read_alignment.query_sequence
            if duplex_orientation
            else sequtil.revcomp(duplex_read_alignment.query_sequence)
        )
        mapping = duplex_mod.map_simplex_to_duplex(
            simplex_seq=read.seq, duplex_seq=duplex_read_sequence
        )
        duplex_to_read_signal = coords.map_ref_to_signal(
            query_to_signal=read.query_to_signal,
            ref_to_query_knots=mapping.duplex_to_simplex_mapping,
        )
        read.seq = mapping.trimmed_duplex_seq
        read.query_to_signal = duplex_to_read_signal
        read.ref_seq = None
        read.ref_to_signal = None
        read.ref_reg = None
        return read, mapping.duplex_offset


def iter_signal(pod5_path, num_reads=None, read_ids=None, rev_sig=False,
                pa_scaling=None):
    """Yield (Read, err) with signal loaded from POD5.

    Reference analog ``io.py:441–474``. Calibration arrives from
    remora_tpu.io.pod5 already in (x - shift) / scale form, so both this
    path and ``Read.from_pod5_and_alignment`` produce identical (and
    physically sensible) pA scaling — the reference's two entry points
    disagree on this convention; we follow the pipeline one, which is
    consistent with the sm/sd BAM tags.
    """
    from remora_tpu.io.pod5 import DatasetReader

    pa_kwargs = {}
    if pa_scaling is not None:
        pa_kwargs["shift_pa_to_zc_pa"] = pa_scaling[0]
        pa_kwargs["scale_pa_to_zc_pa"] = pa_scaling[1]
    with DatasetReader(pod5_path) as pod5_dr:
        for read_num, pod5_read in enumerate(pod5_dr.reads(selection=read_ids)):
            if num_reads is not None and read_num >= num_reads:
                LOGGER.debug(f"Completed pod5 signal worker, reached {num_reads}.")
                return
            dacs = pod5_read.signal[::-1] if rev_sig else pod5_read.signal
            yield Read(
                read_id=str(pod5_read.read_id),
                dacs=dacs,
                shift_dacs_to_pa=pod5_read.calibration.offset,
                scale_dacs_to_pa=pod5_read.calibration.scale,
                **pa_kwargs,
            ), None
    LOGGER.debug("Completed signal worker")


def extract_alignments(read_err, bam_idx, rev_sig=False, pa_scaling=None):
    """Join one signal Read against all of its BAM alignments."""
    io_read, err = read_err
    if io_read is None:
        return [read_err]
    read_alignments = []
    try:
        for bam_read in bam_idx.get_alignments(io_read.read_id):
            align_read = io_read.copy()
            try:
                align_read.add_alignment(
                    bam_read, reverse_signal=rev_sig, pa_scaling=pa_scaling
                )
                read_alignments.append((align_read, None))
            except RemoraError as e:
                LOGGER.debug(f"{io_read.read_id} Extract alignment error: {e}")
                read_alignments.append((align_read, str(e)))
    except RemoraError as e:
        LOGGER.debug(f"{io_read.read_id} Extract alignment error: {e}")
        return [(io_read, str(e))]
    return read_alignments
