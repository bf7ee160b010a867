"""Signal-mapping refiner: scaling + banded-DP refinement manager.

Reference analog: ``SigMapRefiner`` (``src/remora/refine_signal_map.py:
150–626``) plus the top-level ``refine_signal_mapping`` (``:778–840``).
"""

from dataclasses import dataclass, field

import numpy as np

from remora_tpu import RemoraError, log
from remora_tpu.constants import (
    DEFAULT_REFINE_ALGO,
    DEFAULT_REFINE_HBW,
    DEFAULT_REFINE_SHORT_DWELL_PARAMS,
    DEFAULT_ROUGH_RESCALE_METHOD,
    REFINE_ALGO_DWELL_PEN_NAME,
    ROUGH_RESCALE_LEAST_SQUARES,
    ROUGH_RESCALE_METHODS,
    ROUGH_RESCALE_THEIL_SEN,
)
from remora_tpu.refine import band as band_mod
from remora_tpu.refine import dp as dp_mod
from remora_tpu.refine import levels as levels_mod
from remora_tpu.refine import rescale as rescale_mod

LOGGER = log.get_logger()


def compute_dwell_pen_array(target, limit, weight):
    if limit > target:
        LOGGER.warning(
            f"Requested short dwell limit ({limit}) is greater than target "
            f"dwell ({target}). Setting limit to target."
        )
        limit = target
    return weight * np.square(np.arange(limit, dtype=np.float32) - target)


DEFAULT_REFINE_SHORT_DWELL_PEN = compute_dwell_pen_array(
    *DEFAULT_REFINE_SHORT_DWELL_PARAMS
)


def refine_signal_mapping(
    signal,
    seq_to_sig_map,
    levels,
    band_half_width=DEFAULT_REFINE_HBW,
    refine_algo=DEFAULT_REFINE_ALGO,
    short_dwell_pen=DEFAULT_REFINE_SHORT_DWELL_PEN,
    adjust_band_min_step=2,
):
    """Refine one read's mapping against expected levels.

    Returns (path + sig offset, all_scores, traceback, seq_band,
    base_offsets) matching the reference return contract.
    """
    signal = signal[seq_to_sig_map[0] : seq_to_sig_map[-1]]
    sig_map_start = 0
    if seq_to_sig_map[0] != 0:
        sig_map_start = seq_to_sig_map[0]
        seq_to_sig_map = seq_to_sig_map - seq_to_sig_map[0]

    sig_band = band_mod.compute_sig_band(
        seq_to_sig_map, levels, bhw=band_half_width
    )
    seq_band = band_mod.convert_to_seq_band(sig_band)
    band_mod.adjust_seq_band(seq_band, min_step=adjust_band_min_step)
    band_mod.validate_band(
        seq_band,
        sig_len=signal.shape[0],
        seq_len=levels.shape[0],
        is_sig_band=False,
    )
    temp_levels = np.nan_to_num(levels, nan=0.0)
    # native C++ DP when available (same semantics, ~70x the NumPy path);
    # full NumPy decode otherwise
    from remora_tpu.io.native import banded_dp_path

    path = banded_dp_path(
        signal.astype(np.float32),
        temp_levels.astype(np.float32),
        seq_band,
        short_dwell_pen,
        refine_algo,
    )
    if path is not None:
        return path + sig_map_start, None, None, seq_band, None
    all_scores, path, traceback, base_offsets = dp_mod.seq_banded_dp(
        signal.astype(np.float32),
        temp_levels.astype(np.float32),
        seq_band,
        short_dwell_pen,
        refine_algo,
    )
    return path + sig_map_start, all_scores, traceback, seq_band, base_offsets


@dataclass
class SigMapRefiner:
    """K-mer level table + rescaling + refinement driver."""

    kmer_model_filename: str = None
    do_rough_rescale: bool = False
    scale_iters: int = -1
    algo: str = DEFAULT_REFINE_ALGO
    half_bandwidth: int = DEFAULT_REFINE_HBW
    sd_params: tuple = None
    do_fix_guage: bool = False
    rough_rescale_method: str = DEFAULT_ROUGH_RESCALE_METHOD

    sd_arr: np.ndarray = field(
        default_factory=lambda: DEFAULT_REFINE_SHORT_DWELL_PEN
    )
    _levels_array: np.ndarray = None
    str_kmer_levels: dict = None
    kmer_len: int = None
    kmer_idx_stats: list = None
    center_idx: int = -1
    is_loaded: bool = False

    def __repr__(self):
        if not self.is_loaded:
            return "No remora_tpu signal refine/map settings loaded"
        r_str = (
            f"Loaded {self.kmer_len}-mer table with {self.center_idx + 1} "
            "central position."
        )
        if self.do_rough_rescale:
            r_str += " Rough re-scaling will be executed."
        if self.scale_iters > 0:
            r_str += (
                f" {self.scale_iters} rounds of signal mapping refinement "
                "followed by precise re-scaling will be executed."
            )
        if self.scale_iters >= 0:
            r_str += (
                " Signal mapping refinement will be executed using the "
                f"{self.algo} refinement method (band half width: "
                f"{self.half_bandwidth})."
            )
            if self.algo == REFINE_ALGO_DWELL_PEN_NAME:
                r_str += f" Short dwell penalty array set to {self.sd_arr}."
        return r_str

    @property
    def bases_before(self):
        return self.center_idx

    @property
    def bases_after(self):
        return self.kmer_len - self.center_idx - 1

    @property
    def is_valid(self):
        if self.is_loaded:
            return self.do_rough_rescale or self.scale_iters >= 0
        return not self.do_rough_rescale and self.scale_iters < 0

    def __post_init__(self):
        if self._levels_array is not None and not np.array_equal(
            self._levels_array, np.array(None)
        ):
            self.is_loaded = True
            self.kmer_len = int(np.log(self._levels_array.size) / np.log(4))
            assert 4**self.kmer_len == self._levels_array.size
        elif self.kmer_model_filename is not None:
            self.str_kmer_levels, self.kmer_len = levels_mod.load_kmer_table(
                self.kmer_model_filename
            )
            self.is_loaded = True
            self._determine_dominant_pos()
            if self.do_fix_guage:
                self.fix_gauge()
        elif self.str_kmer_levels is not None:
            self.is_loaded = True
            self._determine_dominant_pos()
            if self.do_fix_guage:
                self.fix_gauge()
        if not self.is_loaded and (self.do_rough_rescale or self.scale_iters >= 0):
            raise RemoraError(
                "Signal re-scaling is requested without levels table. "
                f"is_loaded: {self.is_loaded} "
                f"do_rough_rescale: {self.do_rough_rescale} "
                f"scale_iters: {self.scale_iters}"
            )
        if self.sd_params is not None:
            self.sd_arr = compute_dwell_pen_array(*self.sd_params)
        if not self.is_valid:
            LOGGER.warning(
                "K-mer table provided, but not used. See rough rescaling options."
            )
        if self.rough_rescale_method not in ROUGH_RESCALE_METHODS:
            raise RemoraError(
                f"Invalid rough re-scale method: {self.rough_rescale_method}"
            )

    def _determine_dominant_pos(self):
        if self.str_kmer_levels is None:
            return
        self.center_idx, self.kmer_idx_stats = levels_mod.determine_dominant_pos(
            self.str_kmer_levels, self.kmer_len
        )

    @property
    def levels_array(self):
        if self._levels_array is None:
            if self.str_kmer_levels is None:
                return None
            self._levels_array = levels_mod.levels_dict_to_array(
                self.str_kmer_levels, self.kmer_len
            )
        return self._levels_array

    @property
    def kmers(self):
        yield from levels_mod.all_kmers(self.kmer_len)

    def write_kmer_table(self, fh):
        for kmer in levels_mod.all_kmers(self.kmer_len):
            fh.write(
                f"{kmer}\t{self.levels_array[levels_mod.index_from_kmer(kmer)]}\n"
            )

    def fix_gauge(self):
        self._levels_array = levels_mod.fix_gauge(self.levels_array)
        self.str_kmer_levels = {
            kmer: self._levels_array[levels_mod.index_from_kmer(kmer)]
            for kmer in levels_mod.all_kmers(self.kmer_len)
        }

    def extract_levels(self, int_seq):
        return levels_mod.extract_levels(
            int_seq, self.levels_array, self.kmer_len, self.center_idx
        )

    def rough_rescale(
        self,
        shift,
        scale,
        seq_to_sig_map,
        int_seq,
        dacs,
        quants=np.arange(0.05, 1, 0.05),
        clip_bases=10,
        use_base_center=True,
    ):
        """Quantile-based rescale of (shift, scale) against expected levels."""
        levels = self.extract_levels(int_seq)
        if use_base_center:
            optim_dacs = dacs[(seq_to_sig_map[:-1] + seq_to_sig_map[1:]) // 2]
            if clip_bases > 0 and levels.size > clip_bases * 2:
                levels = levels[clip_bases:-clip_bases]
                optim_dacs = optim_dacs[clip_bases:-clip_bases]
        else:
            optim_dacs = dacs[seq_to_sig_map[0] : seq_to_sig_map[-1]]
        if self.rough_rescale_method == ROUGH_RESCALE_LEAST_SQUARES:
            return rescale_mod.rough_rescale_lstsq(
                optim_dacs, levels, shift, scale, quants
            )
        elif self.rough_rescale_method == ROUGH_RESCALE_THEIL_SEN:
            return rescale_mod.rough_rescale_theil_sen(
                optim_dacs, levels, shift, scale, quants
            )
        raise RemoraError(
            f"Invalid rough re-scale method: {self.rough_rescale_method}"
        )

    def rescale(
        self,
        levels,
        dacs,
        shift,
        scale,
        seq_to_sig_map,
        dwell_filter_pctls=(10, 90),
        min_abs_level=0.2,
        edge_filter_bases=10,
        min_levels=10,
    ):
        """Precise rescale from the current mapping with dwell/level filters."""
        with np.errstate(invalid="ignore"):
            dacs_cumsum = np.empty(dacs.size + 1)
            dacs_cumsum[0] = 0
            dacs_cumsum[1:] = np.cumsum(dacs)
            dwells = np.diff(seq_to_sig_map)
            dac_means = np.diff(dacs_cumsum[seq_to_sig_map]) / dwells
        dwells = np.diff(seq_to_sig_map)
        dwell_min, dwell_max = np.percentile(dwells, dwell_filter_pctls)
        edge_filter = np.full(dwells.size, True, dtype=bool)
        if edge_filter_bases > 0:
            edge_filter[:edge_filter_bases] = False
            edge_filter[-edge_filter_bases:] = False
        valid_bases = np.logical_and.reduce(
            (
                dwells > dwell_min,
                dwells < dwell_max,
                np.abs(levels - np.mean(levels)) > min_abs_level,
                np.logical_not(np.isnan(dac_means)),
                edge_filter,
            )
        )
        filt_levels = levels[valid_bases]
        filt_dacs = dac_means[valid_bases]
        if filt_levels.size < min_levels:
            raise RemoraError("Too few positions")
        return rescale_mod.rescale_theil_sen(filt_dacs, filt_levels, shift, scale)

    def refine_sig_map(self, shift, scale, seq_to_sig_map, int_seq, dacs):
        """scale_iters rounds of banded-DP refinement + precise rescale."""
        levels = self.extract_levels(int_seq)
        dacs = dacs[seq_to_sig_map[0] : seq_to_sig_map[-1]]
        sig_st = seq_to_sig_map[0]
        seq_to_sig_map = seq_to_sig_map - sig_st
        for _ in range(max(1, self.scale_iters)):
            seq_to_sig_map, _, _, _, _ = refine_signal_mapping(
                (dacs - shift) / scale,
                seq_to_sig_map,
                levels,
                self.half_bandwidth,
                self.algo,
                self.sd_arr,
            )
            if self.scale_iters > 0:
                try:
                    shift, scale = self.rescale(
                        levels, dacs, shift, scale, seq_to_sig_map
                    )
                except RemoraError as e:
                    LOGGER.debug(f"rescaling error: {e}")
                    break
        return seq_to_sig_map + sig_st, shift, scale

    # --- (de)serialization ---
    def asdict(self):
        return {
            "refine_kmer_levels": self.levels_array if self.is_loaded else None,
            "refine_kmer_center_idx": self.center_idx,
            "refine_do_rough_rescale": self.do_rough_rescale,
            "refine_scale_iters": self.scale_iters,
            "refine_algo": self.algo,
            "refine_half_bandwidth": self.half_bandwidth,
            "refine_sd_arr": self.sd_arr,
            "rough_rescale_method": self.rough_rescale_method,
        }

    @classmethod
    def load_from_metadata(cls, metadata):
        return cls(
            _levels_array=metadata.get("refine_kmer_levels"),
            center_idx=metadata.get("refine_kmer_center_idx"),
            do_rough_rescale=metadata.get("refine_do_rough_rescale"),
            scale_iters=metadata.get("refine_scale_iters"),
            algo=metadata.get("refine_algo"),
            half_bandwidth=metadata.get("refine_half_bandwidth"),
            sd_arr=metadata.get("refine_sd_arr"),
            rough_rescale_method=metadata.get(
                "rough_rescale_method", ROUGH_RESCALE_LEAST_SQUARES
            ),
        )

    @classmethod
    def load_from_dict(cls, data, **kwargs):
        kmer_len = len(next(iter(data.keys())))
        return cls(str_kmer_levels=data, kmer_len=kmer_len, **kwargs)

    def __eq__(self, other):
        if not isinstance(other, SigMapRefiner):
            return False
        if self.do_rough_rescale != other.do_rough_rescale:
            return False
        if self.scale_iters != other.scale_iters:
            return False
        if not self.do_rough_rescale and self.scale_iters < 0:
            return True
        if self.rough_rescale_method != other.rough_rescale_method:
            return False
        if (
            not np.array_equal(self._levels_array, other._levels_array)
            or self.center_idx != other.center_idx
        ):
            return False
        if self.scale_iters < 0:
            return True
        return all(
            (
                self.algo == other.algo,
                self.half_bandwidth == other.half_bandwidth,
                np.array_equal(self.sd_arr, other.sd_arr),
            )
        )

    def get_sub_kmer_table(self, sub_kmer_size):
        """Mean levels for a smaller k-mer centered on the dominant position.

        Returns a list of (sub_kmer, mean_level, dominant_base) sorted by
        level (the reference returns a polars frame; plain tuples here).
        """
        if sub_kmer_size >= self.kmer_len:
            raise RemoraError(
                "Sub k-mer size must be smaller than stored k-mer size"
            )
        if self.kmer_idx_stats is None:
            self._determine_dominant_pos()
        sub_range = [self.center_idx, self.center_idx + 1]
        dominant_base = 0
        while sub_range[1] - sub_range[0] < sub_kmer_size:
            if sub_range[0] == 0:
                sub_range[1] += 1
            elif sub_range[1] == self.kmer_len:
                dominant_base += 1
                sub_range[0] -= 1
            elif (
                self.kmer_idx_stats[sub_range[0] - 1]
                > self.kmer_idx_stats[sub_range[1]]
            ):
                dominant_base += 1
                sub_range[0] -= 1
            else:
                sub_range[1] += 1
        sums = {}
        for kmer, level in zip(self.kmers, self.levels_array):
            sub = kmer[sub_range[0] : sub_range[0] + sub_kmer_size]
            tot, cnt = sums.get(sub, (0.0, 0))
            sums[sub] = (tot + float(level), cnt + 1)
        rows = [
            (sub, tot / cnt, sub[dominant_base])
            for sub, (tot, cnt) in sums.items()
        ]
        rows.sort(key=lambda r: r[1])
        return rows
