"""Vectorized per-base signal metrics (dwell / mean / sd, trimmed variants).

Behavioral parity with the reference ``src/remora/metrics.py``: all
statistics are computed with the cumulative-sum trick from a
sequence->signal mapping.
"""

import numpy as np

DEFAULT_START_TRIM = 1
DEFAULT_END_TRIM = 1


def _clip_sig(sig, seq_to_sig):
    sig = sig[seq_to_sig[0] : seq_to_sig[-1]]
    return sig, seq_to_sig - seq_to_sig[0]


def _cumsum0(sig):
    cs = np.empty(sig.size + 1)
    cs[0] = 0
    cs[1:] = np.cumsum(sig)
    return cs


def _base_means(sig, seq_to_sig, dwells):
    cs = _cumsum0(sig)
    with np.errstate(divide="ignore", invalid="ignore"):
        means = np.diff(cs[seq_to_sig]) / dwells
        means[np.isinf(means)] = np.nan
    return means


def _trim_means(sig, seq_to_sig, dwells, st_trim, en_trim):
    cs = _cumsum0(sig)
    trim_sts = np.minimum(sig.size, seq_to_sig[:-1] + st_trim)
    trim_ens = np.maximum(0, seq_to_sig[1:] - en_trim)
    trim_sums = cs[trim_ens] - cs[trim_sts]
    trim_dwells = np.maximum(0, dwells - st_trim - en_trim)
    with np.errstate(divide="ignore", invalid="ignore"):
        means = trim_sums / trim_dwells
        means[np.isinf(means)] = np.nan
    return means


def compute_dwell(sig, seq_to_sig, **kwargs):
    return {"dwell": np.diff(seq_to_sig).astype(np.float32)}


def compute_dwell_mean(sig, seq_to_sig, **kwargs):
    dwells = compute_dwell(sig, seq_to_sig)["dwell"]
    sig, seq_to_sig = _clip_sig(sig, seq_to_sig)
    return {"dwell": dwells, "mean": _base_means(sig, seq_to_sig, dwells)}


def compute_dwell_mean_sd(sig, seq_to_sig, **kwargs):
    dwells = compute_dwell(sig, seq_to_sig)["dwell"]
    sig, seq_to_sig = _clip_sig(sig, seq_to_sig)
    means = _base_means(sig, seq_to_sig, dwells)
    ss_cs = _cumsum0(np.square(sig))
    with np.errstate(divide="ignore", invalid="ignore"):
        sds = np.sqrt(
            np.maximum(np.diff(ss_cs[seq_to_sig]) / dwells - np.square(means), 0)
        )
        sds[np.isinf(sds)] = np.nan
    return {"dwell": dwells, "mean": means, "sd": sds}


def compute_trimmean(sig, seq_to_sig, **kwargs):
    st = kwargs.get("start_trim", DEFAULT_START_TRIM)
    en = kwargs.get("end_trim", DEFAULT_END_TRIM)
    dwells = compute_dwell(sig, seq_to_sig)["dwell"]
    sig, seq_to_sig = _clip_sig(sig, seq_to_sig)
    return {
        "dwells": dwells,
        "trimmean": _trim_means(sig, seq_to_sig, dwells, st, en),
    }


def compute_trimmean_trimsd(sig, seq_to_sig, **kwargs):
    st = kwargs.get("start_trim", DEFAULT_START_TRIM)
    en = kwargs.get("end_trim", DEFAULT_END_TRIM)
    dwells = compute_dwell(sig, seq_to_sig)["dwell"]
    sig, seq_to_sig = _clip_sig(sig, seq_to_sig)
    trim_means = _trim_means(sig, seq_to_sig, dwells, st, en)
    ss_cs = _cumsum0(np.square(sig))
    trim_sts = np.minimum(sig.size, seq_to_sig[:-1] + st)
    trim_ens = np.maximum(0, seq_to_sig[1:] - en)
    trim_ss = ss_cs[trim_ens] - ss_cs[trim_sts]
    trim_dwells = np.maximum(0, dwells - st - en)
    with np.errstate(divide="ignore", invalid="ignore"):
        trim_sds = np.sqrt(
            np.maximum(0, (trim_ss / trim_dwells) - np.square(trim_means))
        )
        trim_sds[np.isinf(trim_sds)] = np.nan
    return {"dwell": dwells, "trimmean": trim_means, "trimsd": trim_sds}


METRIC_FUNCS = {
    "dwell": compute_dwell,
    "dwell_mean": compute_dwell_mean,
    "dwell_mean_sd": compute_dwell_mean_sd,
    "dwell_trimmean": compute_trimmean,
    "dwell_trimmean_trimsd": compute_trimmean_trimsd,
}
