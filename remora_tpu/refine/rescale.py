"""Signal re-scaling estimators (least squares and Theil–Sen).

Reference analog ``src/remora/refine_signal_map.py:54–121``. All operate
in the (x - shift) / scale convention and return updated (shift, scale).
"""

import numpy as np

from remora_tpu import RemoraError
from remora_tpu.constants import MAX_POINTS_FOR_THEIL_SEN


def rescale_lstsq(dacs, levels, shift, scale):
    norm_sig = (dacs - shift) / scale
    shift_est, scale_est = np.linalg.lstsq(
        np.column_stack([np.ones_like(norm_sig), norm_sig]), levels, rcond=None
    )[0]
    if scale_est == 0:
        return shift, scale
    new_shift = shift - (scale * shift_est / scale_est)
    new_scale = scale / scale_est
    return new_shift, new_scale


def rough_rescale_lstsq(dacs, levels, shift, scale, quants):
    norm_sig = (dacs - shift) / scale
    norm_qs = np.quantile(norm_sig, quants)
    shift_est, scale_est = np.linalg.lstsq(
        np.column_stack([np.ones_like(norm_qs), norm_qs]),
        np.quantile(levels, quants),
        rcond=None,
    )[0]
    if scale_est == 0:
        return shift, scale
    new_shift = shift - (scale * shift_est / scale_est)
    new_scale = scale / scale_est
    return new_shift, new_scale


def compute_slopes(r_event_means, r_model_means):
    delta_event = r_event_means[:, np.newaxis] - r_event_means
    delta_model = r_model_means[:, np.newaxis] - r_model_means
    return delta_model[delta_event > 0] / delta_event[delta_event > 0]


def theil_sen(dacs, lvls, shift, scale):
    from remora_tpu.io.native import theil_sen_slope

    slope = theil_sen_slope(dacs, lvls)
    if slope is None:
        slope = np.median(compute_slopes(dacs, lvls))
    inter = np.median(lvls - (slope * dacs))
    if slope == 0:
        raise RemoraError(
            "Read failed sequence-based signal re-scaling parameter estimation."
        )
    scale_corr = 1 / slope
    shift_corr = -inter / slope
    return shift + (shift_corr * scale), scale * scale_corr


def rescale_theil_sen(dacs, levels, shift, scale):
    norm_sig = (dacs - shift) / scale
    if levels.shape[0] > MAX_POINTS_FOR_THEIL_SEN:
        samp = np.random.choice(
            levels.shape[0], MAX_POINTS_FOR_THEIL_SEN, replace=False
        )
        levels = levels[samp]
        norm_sig = norm_sig[samp]
    return theil_sen(norm_sig, levels, shift, scale)


def rough_rescale_theil_sen(dacs, levels, shift, scale, quants):
    norm_sig = (dacs - shift) / scale
    return theil_sen(
        np.quantile(norm_sig, quants), np.quantile(levels, quants), shift, scale
    )
