"""Band construction for the refinement DP (all vectorized NumPy).

Reference analogs: ``compute_sig_band`` / ``convert_to_seq_band`` /
``validate_band`` (``src/remora/refine_signal_map.py:634–770``) and the
Cython ``adjust_seq_band`` (``refine_signal_map_core.pyx:31–69``) — the
latter's sequential min-step repair is re-derived here as closed-form
reverse/forward cumulative extrema so it vectorizes (and ports directly
to a TPU scan).
"""

import numpy as np

from remora_tpu import RemoraError, log
from remora_tpu.constants import DEFAULT_REFINE_HBW

LOGGER = log.get_logger()


def compute_sig_band(bps, levels, bhw=DEFAULT_REFINE_HBW, is_banded=True):
    """Band in sequence coordinates at each signal position.

    NaN levels pin the band to the current path so the DP cannot reassign
    signal around un-scored bases.
    """
    if is_banded and bhw is None:
        raise RemoraError("Cannot compute band with half width of None.")
    seq_len = levels.size
    if bps.size - 1 != seq_len:
        raise RemoraError("Breakpoints must be one longer than levels.")
    sig_len = bps[-1] - bps[0]
    seq_indices = np.repeat(np.arange(seq_len), np.diff(bps))

    band = np.empty((2, sig_len), dtype=np.int32)
    if is_banded:
        band[0, :] = np.maximum(seq_indices - bhw, 0)
        band[1, :] = np.minimum(seq_indices + bhw + 1, seq_len)
    else:
        band[0, :] = 0
        band[1, :] = seq_len

    nan_mask = np.isin(seq_indices, np.nonzero(np.isnan(levels))[0])
    nan_sig_indices = np.where(nan_mask)[0]
    nan_seq_indices = seq_indices[nan_mask]
    band[0, nan_sig_indices] = nan_seq_indices
    band[1, nan_sig_indices] = nan_seq_indices + 1
    band[0, :] = np.maximum.accumulate(band[0, :])
    band[1, :] = np.minimum.accumulate(band[1, ::-1])[::-1]
    return band


def convert_to_seq_band(sig_band):
    """Transpose a per-signal band into per-base signal-coordinate bounds."""
    sig_len = sig_band.shape[1]
    seq_len = sig_band[1, -1]
    seq_band = np.zeros((2, seq_len), dtype=np.int32)
    seq_band[1, :] = sig_len

    lower_sig_pos = np.nonzero(np.ediff1d(sig_band[1, :], to_begin=0))[0]
    lower_base_pos = sig_band[1, lower_sig_pos - 1]
    seq_band[0, lower_base_pos] = lower_sig_pos
    seq_band[0, :] = np.maximum.accumulate(seq_band[0, :])

    upper_sig_pos = np.nonzero(np.ediff1d(sig_band[0, :], to_begin=0))[0]
    upper_base_pos = sig_band[0, upper_sig_pos]
    seq_band[1, upper_base_pos - 1] = upper_sig_pos
    seq_band[1, :] = np.minimum.accumulate(seq_band[1, ::-1])[::-1]
    return seq_band


def adjust_seq_band(seq_band, min_step=2):
    """Repair a seq band so every base advances by at least ``min_step``.

    In-place, matching the Cython semantics:
      1. backward pass pulls starts down: start[i] <= start[i+1]-min_step
      2. start[0] restored; a cascading forward prefix enforces strict
         increase from the original first coordinate
      3/4. mirrored for the upper bounds.

    The recurrences unroll to reverse/forward cumulative extrema of
    (bound -/+ min_step * index), so everything is vectorized.
    """
    n = seq_band.shape[1]
    idx = np.arange(n, dtype=np.int64)
    min_step = int(min_step)

    # 1: start[i] = min_{j>=i}(start[j] - min_step*(j-i))
    starts = seq_band[0].astype(np.int64)
    band_min = int(starts[0])
    b = starts - min_step * idx
    rev_cummin = np.minimum.accumulate(b[::-1])[::-1]
    starts = rev_cummin + min_step * idx
    # 2: restore first coordinate, then the cascading forward repair
    # assigns start[j] = band_min + j over the contiguous violating prefix
    # (j >= 1 with start[j] < band_min + j, stopping at first satisfied j)
    starts[0] = band_min
    viol = starts[1:] < band_min + idx[1:]
    if viol.size and viol[0]:
        stop = viol.size if viol.all() else int(np.argmin(viol))
        starts[1 : stop + 1] = band_min + idx[1 : stop + 1]

    # 3: end[i] = max_{j<=i}(end[j] + min_step*(i-j))
    ends = seq_band[1].astype(np.int64)
    band_max = int(ends[-1])
    c = ends - min_step * idx
    cummax = np.maximum.accumulate(c)
    ends = cummax + min_step * idx
    # 4: restore last coordinate, then the cascading backward repair
    # assigns end[j] = band_max - (n-1-j) over the contiguous violating
    # suffix (j <= n-2 with end[j] > band_max - (n-1-j))
    ends[-1] = band_max
    dist = n - 1 - idx
    rev = (ends[:-1] > band_max - dist[:-1])[::-1]
    if rev.size and rev[0]:
        stop = rev.size if rev.all() else int(np.argmin(rev))
        ends[n - 1 - stop : n - 1] = band_max - dist[n - 1 - stop : n - 1]

    seq_band[0] = starts
    seq_band[1] = ends
    return seq_band


def validate_band(band, sig_len=None, seq_len=None, is_sig_band=True):
    if band[0, 0] != 0:
        raise RemoraError("Band does not start with 0 coordinate.")
    if np.diff(band, axis=0)[0].min() <= 0:
        raise RemoraError("Band contains 0-length region")
    if np.diff(band[0]).min() < 0:
        raise RemoraError("Band start positions are not monotonically increasing")
    if np.diff(band[1]).min() < 0:
        raise RemoraError("Band end positions are not monotonically increasing")
    if is_sig_band:
        if sig_len is not None and band.shape[1] != sig_len:
            raise RemoraError("Invalid sig_band length")
        if seq_len is not None and band[1, -1] != seq_len:
            raise RemoraError("Invalid sig_band end coordinate")
    else:
        if sig_len is not None and band[1, -1] != sig_len:
            raise RemoraError("Invalid seq_band end coordinate")
        if seq_len is not None and band.shape[1] != seq_len:
            raise RemoraError("Invalid sig_band length")
