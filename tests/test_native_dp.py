"""Native C++ DP parity vs the oracle + the NumPy implementation."""

import numpy as np
import pytest

from tests import oracle_dp

from remora_tpu.io.native import banded_dp_path, get_lib
from remora_tpu.refine.band import (
    adjust_seq_band,
    compute_sig_band,
    convert_to_seq_band,
)
from remora_tpu.refine.refiner import compute_dwell_pen_array


@pytest.mark.skipif(get_lib() is None, reason="native library unavailable")
@pytest.mark.parametrize("algo", ["Viterbi", "dwell_penalty"])
def test_native_dp_matches_oracle(algo):
    rng = np.random.default_rng(17)
    sdp = compute_dwell_pen_array(4, 3, 0.5)
    for _ in range(40):
        seq_len = int(rng.integers(5, 80))
        spb = rng.integers(1, 14, seq_len)
        bps = np.concatenate([[0], np.cumsum(spb)]).astype(np.int64)
        levels = rng.normal(size=seq_len).astype(np.float32)
        signal = rng.normal(size=int(bps[-1])).astype(np.float32)
        sig_band = compute_sig_band(bps, levels, bhw=5)
        seq_band = convert_to_seq_band(sig_band)
        adjust_seq_band(seq_band)
        _s, p_ref, _t, _o = oracle_dp.seq_banded_dp(
            signal, levels, seq_band, sdp, algo
        )
        p_nat = banded_dp_path(signal, levels, seq_band, sdp, algo)
        assert p_nat is not None
        assert np.array_equal(p_ref, p_nat)


@pytest.mark.parametrize("algo", ["Viterbi", "dwell_penalty"])
def test_numpy_dp_matches_oracle_wide_band(algo):
    """Long-read/wide-band exactness of the NumPy DP vs the oracle —
    scores, path, AND traceback bit-equal. Regression: the former
    min-plus/prefix-sum formulation reassociated f32 adds and flipped
    one path position at this geometry (seed 7, bhw 9, ~1.9kb)."""
    from remora_tpu.refine import dp as host_dp

    rng = np.random.default_rng(7)
    sdp = compute_dwell_pen_array(4, 3, 0.5)
    for _ in range(3):
        seq_len = int(rng.integers(1200, 2000))
        spb = rng.integers(1, 15, seq_len)
        bps = np.concatenate([[0], np.cumsum(spb)]).astype(np.int64)
        levels = rng.normal(size=seq_len).astype(np.float32)
        signal = rng.normal(size=int(bps[-1])).astype(np.float32)
        sig_band = compute_sig_band(bps, levels, bhw=9)
        seq_band = convert_to_seq_band(sig_band)
        adjust_seq_band(seq_band)
        s_ref, p_ref, t_ref, _o = oracle_dp.seq_banded_dp(
            signal, levels, seq_band, sdp, algo
        )
        s_np, p_np, t_np, _o2 = host_dp.seq_banded_dp(
            signal, levels, seq_band, sdp, algo
        )
        assert np.array_equal(p_ref, p_np)
        assert np.array_equal(s_ref, s_np)
        assert np.array_equal(t_ref, t_np)
