"""Literal Python transcription of the reference Cython banded DP
(refine_signal_map_core.pyx) used as a ground-truth oracle in tests.
Intentionally slow and line-for-line faithful."""

import numpy as np

LARGE_SCORE = np.float32(100.0)
HUGE_VALF = np.float32(np.finfo(np.float32).max)


def score(s, l):
    tmp = np.float32(s) - np.float32(l)
    return np.float32(tmp * tmp)


def vit_step(curr_scores, curr_tb, prev_scores, curr_level, curr_signal,
             band_start_diff, sdp):
    prev_scores = prev_scores.copy()
    if band_start_diff == 0:
        curr_scores[0] = LARGE_SCORE + prev_scores[prev_scores.shape[0] - 1]
        curr_tb[0] = -1
    else:
        base_score = score(curr_level, curr_signal[0])
        curr_scores[0] = prev_scores[band_start_diff - 1] + base_score
        curr_tb[0] = 0
        prev_scores = prev_scores[band_start_diff:]
    if prev_scores.shape[0] == curr_scores.shape[0]:
        prev_scores = prev_scores[: prev_scores.shape[0] - 1]
    for band_pos in range(1, prev_scores.shape[0] + 1):
        base_score = score(curr_level, curr_signal[band_pos])
        move_score = prev_scores[band_pos - 1] + base_score
        stay_score = curr_scores[band_pos - 1] + base_score
        if move_score < stay_score:
            curr_scores[band_pos] = move_score
            curr_tb[band_pos] = 0
        else:
            curr_scores[band_pos] = stay_score
            curr_tb[band_pos] = curr_tb[band_pos - 1] + 1
    for band_pos in range(prev_scores.shape[0] + 1, curr_scores.shape[0]):
        base_score = score(curr_level, curr_signal[band_pos])
        curr_scores[band_pos] = curr_scores[band_pos - 1] + base_score
        curr_tb[band_pos] = curr_tb[band_pos - 1] + 1


def dwell_penalty_step(curr_scores, curr_tb, prev_scores, curr_level,
                       curr_signal, band_start_diff, dwell_penalty):
    unpen_scores = np.empty_like(curr_scores)
    unpen_tb = np.empty_like(curr_tb)
    vit_step(unpen_scores, unpen_tb, prev_scores, curr_level, curr_signal,
             band_start_diff, dwell_penalty)
    for band_pos in range(curr_scores.shape[0]):
        if (band_pos + band_start_diff - prev_scores.shape[0]
                >= dwell_penalty.shape[0]):
            curr_scores[band_pos] = (
                curr_scores[band_pos - 1]
                + score(curr_level, curr_signal[band_pos])
            )
            curr_tb[band_pos] = curr_tb[band_pos - 1] + 1
            continue
        curr_scores[band_pos] = (
            LARGE_SCORE + prev_scores[prev_scores.shape[0] - 1]
        )
        curr_tb[band_pos] = -1
        if band_pos == 0 and band_start_diff == 0:
            continue
        running_pos_score = np.float32(0)
        for dwell_idx in range(dwell_penalty.shape[0]):
            if dwell_idx > band_pos or (
                band_start_diff == 0 and band_pos == dwell_idx
            ):
                break
            running_pos_score += score(
                curr_level, curr_signal[band_pos - dwell_idx]
            )
            if (band_pos - dwell_idx - 1 + band_start_diff
                    >= prev_scores.shape[0]):
                continue
            pos_score = (
                prev_scores[band_pos - dwell_idx - 1 + band_start_diff]
                + running_pos_score
                + dwell_penalty[dwell_idx]
            )
            if pos_score < curr_scores[band_pos]:
                curr_scores[band_pos] = pos_score
                curr_tb[band_pos] = dwell_idx
        if band_pos >= dwell_penalty.shape[0]:
            pos_score = (
                unpen_scores[band_pos - dwell_penalty.shape[0]]
                + running_pos_score
            )
            if pos_score < curr_scores[band_pos]:
                curr_scores[band_pos] = pos_score
                curr_tb[band_pos] = (
                    unpen_tb[band_pos - dwell_penalty.shape[0]]
                    + dwell_penalty.shape[0]
                )


def banded_forward_dp(signal, levels, seq_band, short_dwell_penalty,
                      core_method):
    step = vit_step if core_method == "Viterbi" else dwell_penalty_step
    base_offsets_raw = np.cumsum(np.diff(seq_band, axis=0)[0])
    band_len = int(base_offsets_raw[-1])
    base_offsets = np.empty(seq_band.shape[1] + 1, dtype=np.uint32)
    base_offsets[0] = 0
    base_offsets[1:] = base_offsets_raw
    all_scores = np.empty(band_len, dtype=np.float32)
    traceback = np.empty(band_len, dtype=np.int32)

    curr_bw = seq_band[1, 0]
    prev_scores = np.full(curr_bw, HUGE_VALF, dtype=np.float32)
    prev_scores[0] = 0
    step(all_scores[:curr_bw], traceback[:curr_bw], prev_scores, levels[0],
         signal[:curr_bw], 1, short_dwell_penalty)
    prev_bw = curr_bw
    prev_band_st = prev_offset = 0
    for base_idx in range(1, levels.shape[0]):
        curr_band_st = seq_band[0, base_idx]
        curr_band_en = seq_band[1, base_idx]
        curr_bw = curr_band_en - curr_band_st
        curr_offset = int(base_offsets[base_idx])
        step(
            all_scores[curr_offset : curr_offset + curr_bw],
            traceback[curr_offset : curr_offset + curr_bw],
            all_scores[prev_offset : prev_offset + prev_bw],
            levels[base_idx],
            signal[curr_band_st:curr_band_en],
            curr_band_st - prev_band_st,
            short_dwell_penalty,
        )
        prev_band_st = curr_band_st
        prev_bw = curr_bw
        prev_offset = curr_offset
    return all_scores, traceback, base_offsets


def banded_traceback(path, seq_band, base_offsets, traceback):
    path[0] = 0
    path[path.shape[0] - 1] = seq_band[1, seq_band.shape[1] - 1]
    for base_idx in range(path.shape[0] - 2, 0, -1):
        sig_lookup_pos = path[base_idx + 1] - 1
        next_sig_offset = traceback[
            int(base_offsets[base_idx]) + sig_lookup_pos
            - seq_band[0, base_idx]
        ]
        path[base_idx] = sig_lookup_pos - next_sig_offset


def seq_banded_dp(signal, levels, seq_band, short_dwell_penalty,
                  core_method="Viterbi"):
    all_scores, traceback, base_offsets = banded_forward_dp(
        signal.astype(np.float32), levels.astype(np.float32), seq_band,
        short_dwell_penalty.astype(np.float32), core_method)
    path = np.empty(levels.shape[0] + 1, dtype=np.int32)
    banded_traceback(path, seq_band, base_offsets, traceback)
    return all_scores, path, traceback, base_offsets
