"""Banded Viterbi / dwell-penalty dynamic program (host reference impl).

Reference analog: ``src/remora/refine_signal_map_core.pyx`` (505 LoC of
Cython). Semantics preserved exactly, including tie-breaking (move wins
only on strictly smaller score; dwell candidates are scanned in
ascending dwell order with strict improvement) and the invalid-entry
sentinel ``LARGE_SCORE + prev[-1]``.

The inner per-base recurrence is reformulated as a min-plus prefix scan:
with band-local squared-error costs ``base`` and inclusive cumsum ``B``,

    curr[p] = B[p] + min_{q<=p} (entry[q] - B[q])

so each base is one vectorized cummin over the band — the exact
structure the batched TPU kernel (remora_tpu.kernels.refine_dp) uses
with ``jax.lax.scan`` over bases. This module is the NumPy ground truth
the TPU kernel is tested against.
"""

import numpy as np

from remora_tpu import RemoraError
from remora_tpu.constants import (
    REFINE_ALGO_DWELL_PEN_NAME,
    REFINE_ALGO_VIT_NAME,
)

LARGE_SCORE = np.float32(100.0)
HUGE = np.float32(np.finfo(np.float32).max)


def _band_costs(signal, level):
    d = signal - level
    return d * d


def _vit_step(prev_scores, level, curr_signal, bsd):
    """One base of the standard Viterbi pass, vectorized via cummin.

    Returns (curr_scores, curr_tb) of length len(curr_signal).
    """
    W = curr_signal.shape[0]
    base = _band_costs(curr_signal, level).astype(np.float32)
    B = np.cumsum(base, dtype=np.float32)
    # entry[q]: score of moving into this base at band position q
    entry = np.full(W, np.float32(np.inf), dtype=np.float32)
    entry_tb = np.zeros(W, dtype=np.int32)
    if bsd == 0:
        entry[0] = LARGE_SCORE + prev_scores[-1]
        entry_tb[0] = -1
    else:
        entry[0] = prev_scores[bsd - 1] + base[0]
    n_move = min(prev_scores.shape[0] - bsd, W - 1)
    if n_move > 0:
        ps = np.arange(1, n_move + 1)
        entry[ps] = prev_scores[ps - 1 + bsd] + base[ps]
    # min-plus scan: curr[p] = B[p] + min_{q<=p}(entry[q] - B[q])
    m = entry - B
    cummin = np.minimum.accumulate(m)
    curr = B + cummin
    # argcummin (first occurrence) for traceback
    qstar = np.zeros(W, dtype=np.int64)
    best = m[0]
    bq = 0
    for p in range(1, W):
        if m[p] < best:
            best = m[p]
            bq = p
        qstar[p] = bq
    tb = (np.arange(W) - qstar).astype(np.int32) + entry_tb[qstar]
    return curr.astype(np.float32), tb


def _argcummin(m):
    """First-occurrence running argmin (vectorized)."""
    cummin = np.minimum.accumulate(m)
    # position is new argmin where m == cummin and cummin strictly dropped
    is_new = np.empty(m.shape[0], dtype=bool)
    is_new[0] = True
    is_new[1:] = cummin[1:] < cummin[:-1]
    idx = np.where(is_new, np.arange(m.shape[0]), 0)
    return np.maximum.accumulate(idx), cummin


def _vit_step_fast(prev_scores, level, curr_signal, bsd):
    """Fully vectorized _vit_step (no Python loop)."""
    W = curr_signal.shape[0]
    base = _band_costs(curr_signal, level).astype(np.float32)
    B = np.cumsum(base, dtype=np.float32)
    entry = np.full(W, np.float32(np.inf), dtype=np.float32)
    entry_tb0 = -1 if bsd == 0 else 0
    if bsd == 0:
        entry[0] = LARGE_SCORE + prev_scores[-1]
    else:
        entry[0] = prev_scores[bsd - 1] + base[0]
    n_move = min(prev_scores.shape[0] - bsd, W - 1)
    if n_move > 0:
        ps = np.arange(1, n_move + 1)
        entry[ps] = prev_scores[ps - 1 + bsd] + base[ps]
    m = entry - B
    qstar, cummin = _argcummin(m)
    curr = (B + cummin).astype(np.float32)
    tb = (np.arange(W) - qstar).astype(np.int32)
    if entry_tb0 == -1:
        tb[qstar == 0] -= 1
    return curr, tb


def _dwell_pen_step(prev_scores, level, curr_signal, bsd, sdp):
    """One base of the dwell-penalty pass (vectorized over the band)."""
    W = curr_signal.shape[0]
    L = sdp.shape[0]
    base = _band_costs(curr_signal, level).astype(np.float32)
    B0 = np.concatenate([[np.float32(0)], np.cumsum(base, dtype=np.float32)])
    # unpenalized Viterbi scores for the long-dwell fallback
    unpen, unpen_tb = _vit_step_fast(prev_scores, level, curr_signal, bsd)

    invalid = LARGE_SCORE + prev_scores[-1]
    curr = np.full(W, invalid, dtype=np.float32)
    tb = np.full(W, -1, dtype=np.int32)

    p = np.arange(W)
    # suffix stay-only region: positions past the previous band by >= L
    p0 = prev_scores.shape[0] - bsd + L
    main = p < p0

    # penalized candidates for dwell_idx d (ascending; strict improvement)
    for d in range(L):
        prev_idx = p - d - 1 + bsd
        valid = (
            main
            & (d <= p)
            & ~((bsd == 0) & (p == d))
            & ~((bsd == 0) & (p == 0))
            & (prev_idx >= 0)
            & (prev_idx < prev_scores.shape[0])
        )
        if not valid.any():
            continue
        vp = p[valid]
        cand = (
            prev_scores[prev_idx[valid]]
            + (B0[vp + 1] - B0[vp - d])
            + sdp[d]
        )
        upd = cand < curr[vp]
        curr[vp[upd]] = cand[upd]
        tb[vp[upd]] = d
    # unpenalized long-dwell candidate
    long_ok = main & (p >= L)
    if long_ok.any():
        vp = p[long_ok]
        cand = unpen[vp - L] + (B0[vp + 1] - B0[vp - L + 1])
        upd = cand < curr[vp]
        curr[vp[upd]] = cand[upd]
        tb[vp[upd]] = unpen_tb[vp[upd] - L] + L
    # stay-only suffix: accumulate from the last main position
    if p0 < W:
        p0c = max(p0, 1)
        sfx = np.arange(p0c, W)
        curr[sfx] = curr[p0c - 1] + (B0[sfx + 1] - B0[p0c])
        tb[sfx] = tb[p0c - 1] + (sfx - p0c + 1)
    return curr, tb


def banded_forward_dp(signal, levels, seq_band, short_dwell_penalty,
                      core_method=REFINE_ALGO_VIT_NAME):
    """Forward pass over all bases; returns ragged (all_scores, traceback,
    base_offsets)."""
    if core_method == REFINE_ALGO_VIT_NAME:
        step = lambda prev, lvl, sig, bsd: _vit_step_fast(prev, lvl, sig, bsd)
    elif core_method == REFINE_ALGO_DWELL_PEN_NAME:
        step = lambda prev, lvl, sig, bsd: _dwell_pen_step(
            prev, lvl, sig, bsd, short_dwell_penalty
        )
    else:
        raise RemoraError(
            f"Invalid core signal mapping refine method: {core_method}"
        )

    widths = (seq_band[1] - seq_band[0]).astype(np.int64)
    base_offsets_raw = np.cumsum(widths)
    band_len = int(base_offsets_raw[-1])
    if band_len > np.iinfo(np.uint32).max:
        raise RemoraError(
            "Dynamic programming search space too large. Read likely "
            "contains large deletions."
        )
    base_offsets = np.empty(seq_band.shape[1] + 1, dtype=np.uint32)
    base_offsets[0] = 0
    base_offsets[1:] = base_offsets_raw
    all_scores = np.empty(band_len, dtype=np.float32)
    traceback = np.empty(band_len, dtype=np.int32)

    # first base: spoofed stay-only prev scores
    curr_bw = int(seq_band[1, 0])
    prev = np.full(curr_bw, HUGE, dtype=np.float32)
    prev[0] = 0
    curr, tb = step(prev, levels[0], signal[:curr_bw], 1)
    all_scores[:curr_bw] = curr
    traceback[:curr_bw] = tb
    prev_band_st = 0
    prev_scores = curr

    for base_idx in range(1, levels.shape[0]):
        st = int(seq_band[0, base_idx])
        en = int(seq_band[1, base_idx])
        off = int(base_offsets[base_idx])
        curr, tb = step(
            prev_scores, levels[base_idx], signal[st:en], st - prev_band_st
        )
        all_scores[off : off + en - st] = curr
        traceback[off : off + en - st] = tb
        prev_scores = curr
        prev_band_st = st
    return all_scores, traceback, base_offsets


def banded_traceback(seq_band, base_offsets, traceback):
    """Reconstruct the base-start path from the traceback array."""
    seq_len = seq_band.shape[1]
    path = np.empty(seq_len + 1, dtype=np.int32)
    path[0] = 0
    path[-1] = seq_band[1, -1]
    for base_idx in range(seq_len - 1, 0, -1):
        sig_lookup = path[base_idx + 1] - 1
        next_off = traceback[
            int(base_offsets[base_idx]) + sig_lookup - seq_band[0, base_idx]
        ]
        path[base_idx] = sig_lookup - next_off
    return path


def seq_banded_dp(signal, levels, seq_band, short_dwell_penalty,
                  core_method=REFINE_ALGO_VIT_NAME):
    """Full decode: forward pass + traceback.

    Returns (all_scores, path, traceback, base_offsets) — same shape
    contract as the reference Cython ``seq_banded_dp``.
    """
    all_scores, traceback, base_offsets = banded_forward_dp(
        np.asarray(signal, dtype=np.float32),
        np.asarray(levels, dtype=np.float32),
        seq_band,
        np.asarray(short_dwell_penalty, dtype=np.float32),
        core_method,
    )
    path = banded_traceback(seq_band, base_offsets, traceback)
    return all_scores, path, traceback, base_offsets
