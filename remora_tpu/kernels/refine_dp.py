"""Batched banded refinement DP on device (JAX/XLA).

TPU-native formulation of the reference Cython DP
(``refine_signal_map_core.pyx``): the recurrence over bases becomes a
``lax.scan``; within each base every (band-position, read) pair is a
vector element, with the in-band stay recurrence solved as a min-plus
prefix scan (one ``cummin`` per base): with band costs ``base`` and
inclusive cumsum ``B``, ``curr[p] = B[p] + min_{q<=p}(entry[q] - B[q])``.

Exactness caveat: the prefix-sum reassociation is exact in real
arithmetic but not in f32 — at long-read/wide-band geometry a rare tie
can flip a path position relative to the reference C association
(observed ~1 per few thousand bases at bhw=9). The single-launch Pallas
kernels (remora_tpu.kernels.pallas_dp) fold stays sequentially
in-program and ARE bit-exact; they supersede this kernel on hardware.
This module remains the portable XLA formulation (and the fallback when
Mosaic is unavailable).

Internal layout puts READS in the minor (128-lane) axis and the band
position in sublanes — band widths are ~16 while batches are hundreds,
so ``(W, R)`` tiles keep the VPU lanes full where the earlier ``(R, W)``
layout used only W of 128 lanes.

Shapes (static; pad reads to fit):
  signal      (R, S_max)    f32, normalized
  levels      (R, N_max)    f32, 0 where padded
  band_starts (R, N_max)    i32, per-base band start in signal coords
  band_widths (R, N_max)    i32, per-base band width (<= W_max)
  seq_lens    (R,)          i32, true number of bases per read

Outputs:
  path        (R, N_max+1)  i32, signal start per base (valid to seq_len)
  traceback   (N_max, W_max, R) i32 (also returned for parity checks)

The forward pass and traceback both run on device; one fetch returns
the paths for a whole batch of reads.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LARGE_SCORE = jnp.float32(100.0)
BIG = jnp.float32(3.0e38)


def _shift_down(x, k, fill):
    """Static shift along the first axis (x[p, :] -> x[p-k, :])."""
    if k == 0:
        return x
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-k]], axis=0)


def _argcummin(m):
    """Running (first-occurrence) argmin along the first axis."""
    cm = jax.lax.cummin(m, axis=0)
    first = jnp.concatenate(
        [jnp.ones((1,) + m.shape[1:], bool), cm[1:] < cm[:-1]], axis=0
    )
    pos = jnp.arange(m.shape[0])[:, None]
    idx = jnp.where(first, pos, 0)
    return jax.lax.cummax(idx, axis=0), cm


def _vit_step(prev, prev_valid, base, B, bsd, w):
    """Vectorized Viterbi base-step over (W, R) elements.

    prev: previous-base scores aligned to its band start; bsd (R,) band
    start diff; w (R,) current band width. Returns (scores, tb).
    """
    W, R = prev.shape
    p = jnp.arange(W)[:, None]
    # entry (move) scores: prev[p - 1 + bsd] + base[p]
    src = p - 1 + bsd[None, :]
    src_ok = (src >= 0) & (src < prev_valid[None, :])
    prev_g = jnp.take_along_axis(prev, jnp.clip(src, 0, W - 1), axis=0)
    entry = jnp.where(src_ok, prev_g + base, BIG)
    # p == 0 with bsd == 0: invalid-entry sentinel LARGE + prev[last]
    prev_last = jnp.take_along_axis(
        prev, (prev_valid - 1)[None, :], axis=0
    )[0]
    sentinel = LARGE_SCORE + prev_last
    entry = jnp.where(
        (p == 0) & (bsd[None, :] == 0), sentinel[None, :], entry
    )
    # restrict moves to p <= prev_valid - bsd (and p < w)
    move_limit = jnp.minimum(prev_valid - bsd, w - 1)
    movable = (p <= move_limit[None, :]) | (p == 0)
    entry = jnp.where(movable, entry, BIG)
    in_band = p < w[None, :]
    entry = jnp.where(in_band, entry, BIG)

    m = entry - B
    qstar, cm = _argcummin(m)
    scores = B + cm
    tb = (jnp.arange(W)[:, None] - qstar).astype(jnp.int32)
    # invalid entry at q*=0 under bsd==0 counts one extra stay back
    tb = tb - ((qstar == 0) & (bsd[None, :] == 0)).astype(jnp.int32)
    scores = jnp.where(in_band, scores, BIG)
    return scores, tb


def _dwell_step(prev, prev_valid, base, B0, bsd, w, sdp):
    """Vectorized dwell-penalty base-step (reference semantics incl. the
    unpenalized long-dwell fallback and the past-prev-band stay suffix)."""
    W, R = prev.shape
    L = sdp.shape[0]
    p = jnp.arange(W)[:, None]
    in_band = p < w[None, :]

    unpen, unpen_tb = _vit_step(prev, prev_valid, base, B0[1:], bsd, w)

    prev_last = jnp.take_along_axis(
        prev, (prev_valid - 1)[None, :], axis=0
    )[0]
    invalid = (LARGE_SCORE + prev_last)[None, :]
    curr = jnp.broadcast_to(invalid, (W, R))
    tb = jnp.full((W, R), -1, jnp.int32)

    p0 = prev_valid - bsd + L  # stay-only suffix start
    main = p < p0[None, :]
    entry_blocked = (p == 0) & (bsd[None, :] == 0)

    # ONE dynamic gather: prev aligned as prev_m1[p] = prev[p - 1 + bsd];
    # every dwell candidate is then a cheap static sublane shift of it
    src_m1 = p - 1 + bsd[None, :]
    prev_m1 = jnp.take_along_axis(prev, jnp.clip(src_m1, 0, W - 1), axis=0)
    # inclusive band cumsum: Binc[p] = B0[p+1]
    Binc = B0[1:]
    for d in range(L):
        prev_idx = p - d - 1 + bsd[None, :]
        valid = (
            main
            & in_band
            & (d <= p)
            & ~((bsd[None, :] == 0) & (p == d))
            & ~entry_blocked
            & (prev_idx >= 0)
            & (prev_idx < prev_valid[None, :])
        )
        prev_g = _shift_down(prev_m1, d, BIG)
        # run over base costs [p-d .. p] = Binc[p] - Binc[p-d-1]
        run = Binc - _shift_down(Binc, d + 1, jnp.float32(0))
        cand = prev_g + run + sdp[d]
        upd = valid & (cand < curr)
        curr = jnp.where(upd, cand, curr)
        tb = jnp.where(upd, d, tb)
    # unpenalized fallback for dwells > L (static shifts of the vit pass)
    long_ok = main & in_band & (p >= L)
    unpen_g = _shift_down(unpen, L, BIG)
    unpen_tb_g = _shift_down(unpen_tb, L, jnp.int32(0))
    run_L = Binc - _shift_down(Binc, L, jnp.float32(0))
    cand = unpen_g + run_L
    upd = long_ok & (cand < curr)
    curr = jnp.where(upd, cand, curr)
    tb = jnp.where(upd, unpen_tb_g + L, tb)

    # stay-only suffix: curr[p] = curr[p0c-1] + B0[p+1] - B0[p0c]
    p0c = jnp.maximum(p0, 1)
    anchor = jnp.take_along_axis(
        curr, jnp.clip(p0c - 1, 0, W - 1)[None, :], axis=0
    )[0]
    anchor_tb = jnp.take_along_axis(
        tb, jnp.clip(p0c - 1, 0, W - 1)[None, :], axis=0
    )[0]
    anchor_B = jnp.take_along_axis(
        B0, jnp.clip(p0c, 0, W)[None, :], axis=0
    )[0]
    sfx = in_band & (p >= p0c[None, :])
    # B0[p+1] over p = arange(W) is the static slice Binc
    sfx_scores = anchor[None, :] + Binc - anchor_B[None, :]
    sfx_tb = anchor_tb[None, :] + (p - p0c[None, :] + 1)
    curr = jnp.where(sfx, sfx_scores, curr)
    tb = jnp.where(sfx, sfx_tb, tb)
    curr = jnp.where(in_band, curr, BIG)
    return curr, tb


@partial(
    jax.jit,
    static_argnames=("algo", "w_max"),
)
def banded_dp_batch(signal, levels, band_starts, band_widths, seq_lens,
                    sdp, algo="dwell_penalty", w_max=16):
    """Forward pass + traceback for a batch of reads.

    Returns (path (R, N+1), traceback (N, W, R), scores_final (W, R)).
    """
    R, N = levels.shape
    W = w_max
    dwell = algo == "dwell_penalty"

    # pre-gather all band signal windows + costs in ONE batched gather +
    # vectorized elementwise/cumsum (the scan then only slices its xs).
    # layout: (N, W, R) — reads in the minor/lane axis
    signal_T = signal.T  # (S, R)
    wvec = jnp.arange(W)[:, None]

    def gather_band(st):
        idx = jnp.clip(st[None, :] + wvec, 0, signal_T.shape[0] - 1)
        return jnp.take_along_axis(signal_T, idx, axis=0)

    all_bands = jax.vmap(gather_band)(band_starts.T)  # (N, W, R)
    diffs = all_bands - levels.T[:, None, :]
    in_band_all = wvec[None] < band_widths.T[:, None, :]
    all_base = jnp.where(in_band_all, diffs * diffs, 0.0)
    all_B = jnp.cumsum(all_base, axis=1)

    def scan_body(carry, inputs):
        prev, prev_valid, prev_start = carry
        base, B, st, wdt = inputs
        bsd = st - prev_start
        if dwell:
            B0 = jnp.concatenate(
                [jnp.zeros((1, R), jnp.float32), B], axis=0
            )
            scores, tb = _dwell_step(prev, prev_valid, base, B0, bsd, wdt, sdp)
        else:
            scores, tb = _vit_step(prev, prev_valid, base, B, bsd, wdt)
        return (scores, wdt, st), tb

    # first base: spoofed stay-through prev (prev[0]=0, rest huge), bsd=1
    prev0 = jnp.full((W, R), BIG, jnp.float32).at[0].set(0.0)
    init = (
        prev0,
        band_widths[:, 0],
        band_starts[:, 0] - 1,  # so bsd = 1 for the first base
    )
    (final_scores, _, _), all_tb = jax.lax.scan(
        scan_body,
        init,
        (all_base, all_B, band_starts.T, band_widths.T),
    )

    # traceback: path[i] = lookup - tb[i, lookup-1-start_i, r]
    sig_ends = jnp.take_along_axis(
        band_starts, (seq_lens - 1)[:, None], axis=1
    )[:, 0] + jnp.take_along_axis(
        band_widths, (seq_lens - 1)[:, None], axis=1
    )[:, 0]

    def tb_body(carry, inputs):
        nxt = carry  # path[i+1] per read (R,)
        tb_i, st_i, idx = inputs
        lookup = nxt - 1
        off = jnp.clip(lookup - st_i, 0, W - 1)
        step_back = jnp.take_along_axis(tb_i, off[None, :], axis=0)[0]
        cur = lookup - step_back
        # bases at i >= seq_len (padding) keep propagating the end value;
        # base index 0 always maps to 0 (handled by caller)
        active = (idx >= 1) & (idx <= seq_lens - 1)
        cur = jnp.where(active, cur, nxt)
        return cur, cur

    idxs = jnp.arange(N)
    _, path_rev = jax.lax.scan(
        tb_body,
        sig_ends,
        (all_tb[::-1], band_starts.T[::-1], idxs[::-1]),
    )
    # path_rev[k] corresponds to base index N-1-k = value of path at that idx
    path_mid = path_rev[::-1]  # (N, R): path value for base idx i (1..N-1)
    path = jnp.concatenate(
        [
            jnp.zeros((R, 1), path_mid.dtype),
            path_mid.T[:, 1:],
            jnp.zeros((R, 1), path_mid.dtype),
        ],
        axis=1,
    )
    # final entry: signal end per read at position seq_len
    path = path.at[jnp.arange(R), seq_lens].set(sig_ends)
    return path, all_tb, final_scores


def pad_reads_for_dp(reads, w_max=None):
    """Pack a list of (signal, levels, seq_band) into batch arrays.

    Returns dict of arrays + (n_max, s_max, w_max) shapes used.
    """
    R = len(reads)
    n_max = max(lv.size for _sig, lv, _bd in reads)
    s_max = max(sig.size for sig, _lv, _bd in reads)
    widths = [int((bd[1] - bd[0]).max()) for _sig, _lv, bd in reads]
    if w_max is None:
        w_max = max(widths)
    signal = np.zeros((R, s_max), np.float32)
    levels = np.zeros((R, n_max), np.float32)
    starts = np.zeros((R, n_max), np.int32)
    bwidths = np.ones((R, n_max), np.int32)
    seq_lens = np.zeros(R, np.int32)
    for r, (sig, lv, bd) in enumerate(reads):
        n = lv.size
        signal[r, : sig.size] = sig
        levels[r, :n] = lv
        starts[r, :n] = bd[0]
        bwidths[r, :n] = bd[1] - bd[0]
        # padding rows: keep band anchored at the end with width 1
        if n < n_max:
            starts[r, n:] = bd[1][-1] - 1
            bwidths[r, n:] = 1
        seq_lens[r] = n
    return {
        "signal": signal,
        "levels": levels,
        "band_starts": starts,
        "band_widths": bwidths,
        "seq_lens": seq_lens,
        "w_max": int(w_max),
    }


def refine_batch(reads, sdp, algo="dwell_penalty", w_max=None):
    """Convenience host API: list of (norm_signal, levels, seq_band) ->
    list of int32 paths (seq_len + 1 each)."""
    packed = pad_reads_for_dp(reads, w_max=w_max)
    path, _tb, _scores = banded_dp_batch(
        jnp.asarray(packed["signal"]),
        jnp.asarray(packed["levels"]),
        jnp.asarray(packed["band_starts"]),
        jnp.asarray(packed["band_widths"]),
        jnp.asarray(packed["seq_lens"]),
        jnp.asarray(sdp, jnp.float32),
        algo=algo,
        w_max=packed["w_max"],
    )
    path = np.asarray(path)
    return [
        path[r, : packed["seq_lens"][r] + 1] for r in range(len(reads))
    ]
