"""Banded refinement DP as Pallas TPU kernels.

The reference inner loop (``refine_signal_map_core.pyx:256–449``) is a
per-base banded recurrence. The earlier XLA formulation
(remora_tpu.kernels.refine_dp) is semantically identical but pays a
fixed dispatch cost per ``lax.scan`` step — thousands of launches per
read batch. Here the WHOLE base loop runs inside one Pallas program:

  * layout (W, R): band positions in sublanes (W <= 16 typically),
    reads in the 128-wide lane axis — full VPU occupancy;
  * grid (R/128, N/K): read tiles x base chunks. Band costs stream
    HBM -> VMEM in (K, W, 128) blocks while the carried DP state
    (prev scores + band bookkeeping) lives in VMEM scratch that
    persists across the chunk dimension of the grid;
  * the in-band stay recurrence is the min-plus prefix scan derived in
    remora_tpu.refine.dp, computed as a log-step Hillis–Steele
    cummin over the 16 sublanes;
  * the per-read band realignment prev[p - 1 + bsd] (bsd varies per
    lane) is a masked select over the W + 1 possible sublane shifts —
    cheap on (16, 128) tiles inside the kernel;
  * traceback is a second Pallas kernel walking the chunks in reverse
    with the per-read path position carried in scratch.

Path-exact against remora_tpu.refine.dp (the line-for-line oracle of
the reference Cython), tested in tests/test_kernels.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LARGE_SCORE = np.float32(100.0)
BIG = np.float32(3.0e38)

LANES = 128


def _rows(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _shift_down(x, k, fill):
    """x[p] = x_in[p - k] (rows < k filled)."""
    if k == 0:
        return x
    rolled = pltpu.roll(x, k, 0)
    return jnp.where(_rows(x.shape) >= k, rolled, fill)


def _shift_up(x, k, fill):
    """x[p] = x_in[p + k] (rows >= W - k filled)."""
    if k == 0:
        return x
    W = x.shape[0]
    rolled = pltpu.roll(x, W - k, 0)
    return jnp.where(_rows(x.shape) < W - k, rolled, fill)


def _cumsum_rows(x):
    """Inclusive cumulative sum along the sublane (band) axis."""
    k = 1
    while k < x.shape[0]:
        x = x + _shift_down(x, k, jnp.float32(0))
        k <<= 1
    return x


def _argcummin_rows(m):
    """Running first-occurrence argmin along the sublane axis."""
    val = m
    idx = _rows(m.shape)
    k = 1
    while k < m.shape[0]:
        val_s = _shift_down(val, k, BIG)
        idx_s = _shift_down(idx, k, jnp.int32(0))
        earlier_wins = val_s <= val
        val = jnp.where(earlier_wins, val_s, val)
        idx = jnp.where(earlier_wins, idx_s, idx)
        k <<= 1
    return idx, val


def _select_row(x, row_idx):
    """x[row_idx[r], r] per lane -> (1, R)."""
    hit = _rows(x.shape) == row_idx
    return jnp.sum(jnp.where(hit, x, jnp.zeros_like(x)), axis=0,
                   keepdims=True)


def _band_align(prev, bsd):
    """prev_g[p] = prev[p - 1 + bsd] per lane (bsd in [0, W]).

    The per-lane shift amount (bsd - 1) is applied by binary
    decomposition: log2(W) conditional sublane shifts instead of a
    W-way select."""
    W = prev.shape[0]
    sh = bsd - 1
    pos_sh = jnp.maximum(sh, 0)
    cur = prev
    nbits = max(1, int(np.ceil(np.log2(max(W, 2)))))
    for b in range(nbits):
        amt = 1 << b
        if amt >= W:
            break
        shifted = _shift_up(cur, amt, BIG)
        cur = jnp.where((pos_sh & amt) != 0, shifted, cur)
    down1 = _shift_down(prev, 1, BIG)
    return jnp.where(sh < 0, down1, cur)


def _vit_core(prev_g, prev_valid, prev_last, base, Binc, bsd, w):
    """Viterbi base step on aligned prev scores; returns (scores, tb)."""
    W = base.shape[0]
    rows = _rows(base.shape)
    src = rows - 1 + bsd
    src_ok = (src >= 0) & (src < prev_valid)
    entry = jnp.where(src_ok, prev_g + base, BIG)
    sentinel = LARGE_SCORE + prev_last
    entry = jnp.where((rows == 0) & (bsd == 0), sentinel, entry)
    move_limit = jnp.minimum(prev_valid - bsd, w - 1)
    entry = jnp.where((rows <= move_limit) | (rows == 0), entry, BIG)
    in_band = rows < w
    entry = jnp.where(in_band, entry, BIG)

    m = entry - Binc
    qstar, cm = _argcummin_rows(m)
    scores = jnp.where(in_band, Binc + cm, BIG)
    tb = rows - qstar - ((qstar == 0) & (bsd == 0)).astype(jnp.int32)
    return scores, tb


def _dwell_core(prev, prev_g, prev_valid, prev_last, base, Binc, bsd, w,
                sdp_vals):
    """Dwell-penalty base step (reference semantics incl. unpenalized
    long-dwell fallback and past-band stay suffix)."""
    W = base.shape[0]
    L = len(sdp_vals)
    rows = _rows(base.shape)
    in_band = rows < w

    unpen, unpen_tb = _vit_core(
        prev_g, prev_valid, prev_last, base, Binc, bsd, w
    )

    invalid = LARGE_SCORE + prev_last
    curr = jnp.broadcast_to(invalid, base.shape)
    tb = jnp.full(base.shape, -1, jnp.int32)

    p0 = prev_valid - bsd + L
    main = rows < p0
    entry_blocked = (rows == 0) & (bsd == 0)

    for d in range(L):
        prev_idx = rows - d - 1 + bsd
        valid = (
            main
            & in_band
            & (rows >= d)
            & ~((bsd == 0) & (rows == d))
            & ~entry_blocked
            & (prev_idx >= 0)
            & (prev_idx < prev_valid)
        )
        prev_gd = _shift_down(prev_g, d, BIG)
        run = Binc - _shift_down(Binc, d + 1, jnp.float32(0))
        cand = prev_gd + run + sdp_vals[d]
        upd = valid & (cand < curr)
        curr = jnp.where(upd, cand, curr)
        tb = jnp.where(upd, d, tb)

    long_ok = main & in_band & (rows >= L)
    cand = _shift_down(unpen, L, BIG) + (
        Binc - _shift_down(Binc, L, jnp.float32(0))
    )
    upd = long_ok & (cand < curr)
    curr = jnp.where(upd, cand, curr)
    tb = jnp.where(upd, _shift_down(unpen_tb, L, jnp.int32(0)) + L, tb)

    # stay-only suffix past the previous band
    p0c = jnp.maximum(p0, 1)
    anchor = _select_row(curr, jnp.clip(p0c - 1, 0, W - 1))
    anchor_tb = _select_row(tb, jnp.clip(p0c - 1, 0, W - 1))
    anchor_B = _select_row(Binc, jnp.clip(p0c - 1, 0, W - 1))
    sfx = in_band & (rows >= p0c)
    curr = jnp.where(sfx, anchor + Binc - anchor_B, curr)
    tb = jnp.where(sfx, anchor_tb.astype(jnp.int32) + rows - p0c + 1, tb)
    curr = jnp.where(in_band, curr, BIG)
    return curr, tb


def _forward_kernel(sdp_ref, base_ref, binc_ref, st_ref, wd_ref, tb_ref,
                    prev_ref, meta_ref, *, K, W, L, dwell):
    """One (read-tile, base-chunk) grid step of the forward DP.

    Scratch: prev_ref (W, LANES) f32 carried scores; meta_ref
    (8, LANES) i32 rows 0/1 = prev band start / prev band width.
    """
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        prev_ref[:] = jnp.full((W, LANES), BIG, jnp.float32)
        prev_ref[0, :] = jnp.zeros((LANES,), jnp.float32)
        # spoofed carry: prev_start = st[0] - 1 (bsd = 1), width = w[0]
        meta_ref[0, :] = st_ref[0, :] - 1
        meta_ref[1, :] = wd_ref[0, :]

    sdp_vals = [sdp_ref[0, d] for d in range(L)] if dwell else []

    def body(k, _):
        base = base_ref[k]
        # band cumsum precomputed outside with XLA's cumsum so float
        # rounding matches the NumPy oracle bit-for-bit
        Binc = binc_ref[k]
        st = st_ref[k, :][None, :]
        w = wd_ref[k, :][None, :]
        prev = prev_ref[:]
        prev_start = meta_ref[0, :][None, :]
        prev_valid = meta_ref[1, :][None, :]
        bsd = st - prev_start

        prev_last = _select_row(prev, prev_valid - 1)
        prev_g = _band_align(prev, bsd)
        if dwell:
            scores, tb = _dwell_core(
                prev, prev_g, prev_valid, prev_last, base, Binc, bsd, w,
                sdp_vals,
            )
        else:
            scores, tb = _vit_core(
                prev_g, prev_valid, prev_last, base, Binc, bsd, w
            )
        tb_ref[k] = tb
        prev_ref[:] = scores
        meta_ref[0, :] = st[0]
        meta_ref[1, :] = w[0]
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def _traceback_kernel(tb_ref, st_ref, lens_ref, ends_ref, path_ref, pos_ref,
                      *, K, W, NC):
    """Reverse walk over chunks; pos_ref (8, LANES) i32 row 0 carries the
    next base's path value."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        pos_ref[0, :] = ends_ref[0, :]

    base0 = (NC - 1 - c) * K

    def body(k, _):
        kk = K - 1 - k
        base_idx = base0 + kk
        nxt = pos_ref[0, :][None, :]
        lookup = nxt - 1
        off = jnp.clip(lookup - st_ref[kk, :][None, :], 0, W - 1)
        tb_k = tb_ref[kk]
        step_back = _select_row(tb_k.astype(jnp.float32), off)
        cur = lookup - step_back.astype(jnp.int32)
        seq_len = lens_ref[0, :][None, :]
        active = (base_idx >= 1) & (base_idx <= seq_len - 1)
        cur = jnp.where(active, cur, nxt)
        path_ref[kk, :] = cur[0]
        pos_ref[0, :] = cur[0]
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def _pad_to(x, size, axis, fill):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


@partial(
    jax.jit,
    static_argnames=("algo", "w_max", "chunk_bases", "interpret"),
)
def banded_dp_batch_pallas(signal, levels, band_starts, band_widths,
                           seq_lens, sdp, algo="dwell_penalty", w_max=16,
                           chunk_bases=32, interpret=False):
    """Forward + traceback for a batch of reads, one launch each.

    Same contract as refine_dp.banded_dp_batch: returns
    (path (R, N+1), traceback (N, W, R), final_scores placeholder).
    """
    R0, N0 = levels.shape
    W = int(np.ceil(max(w_max, 8) / 8)) * 8
    # bound VMEM: base-cost block + tb block, double buffered
    K = int(min(chunk_bases, (2 << 20) // (W * LANES * 4)))
    K = max(8, (K // 8) * 8)  # 2D blocks need sublane-aligned rows
    dwell = algo == "dwell_penalty"
    L = int(sdp.shape[0])

    # pad reads to full lanes and bases to full chunks
    R = int(np.ceil(R0 / LANES)) * LANES
    NC = int(np.ceil(N0 / K))
    N = NC * K
    last_start = band_starts[:, -1:]
    band_starts = _pad_to(
        _pad_to(band_starts, R, 0, 0), N, 1, 0
    )
    if N > N0:
        # padding bases keep a width-1 band anchored at the read end
        band_starts = band_starts.at[:R0, N0:].set(last_start)
    band_widths = _pad_to(_pad_to(band_widths, R, 0, 1), N, 1, 1)
    levels_p = _pad_to(_pad_to(levels, R, 0, 0.0), N, 1, 0.0)
    signal_p = _pad_to(signal, R, 0, 0.0)
    seq_lens_p = _pad_to(jnp.maximum(seq_lens, 1), R, 0, 1)

    # band cost tensor (N, W, R): one batched gather outside the kernel
    signal_T = signal_p.T
    wvec = jnp.arange(W)[:, None]

    def gather_band(st):
        idx = jnp.clip(st[None, :] + wvec, 0, signal_T.shape[0] - 1)
        return jnp.take_along_axis(signal_T, idx, axis=0)

    all_bands = jax.vmap(gather_band)(band_starts.T)
    diffs = all_bands - levels_p.T[:, None, :]
    in_band_all = wvec[None] < band_widths.T[:, None, :]
    all_base = jnp.where(in_band_all, diffs * diffs, 0.0).astype(jnp.float32)
    all_binc = jnp.cumsum(all_base, axis=1, dtype=jnp.float32)

    starts_T = band_starts.T.astype(jnp.int32)
    widths_T = band_widths.T.astype(jnp.int32)
    sdp_2d = jnp.asarray(sdp, jnp.float32)[None, :]

    grid = (R // LANES, NC)
    tb = pl.pallas_call(
        partial(_forward_kernel, K=K, W=W, L=L, dwell=dwell),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, W, LANES), lambda r, c: (c, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, W, LANES), lambda r, c: (c, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), lambda r, c: (c, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), lambda r, c: (c, r),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, W, LANES), lambda r, c: (c, 0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, W, R), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((W, LANES), jnp.float32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(sdp_2d, all_base, all_binc, starts_T, widths_T)

    # per-read signal end = start + width of the final real base
    last_idx = (seq_lens_p - 1)[:, None]
    sig_ends = (
        jnp.take_along_axis(band_starts, last_idx, axis=1)
        + jnp.take_along_axis(band_widths, last_idx, axis=1)
    )[:, 0].astype(jnp.int32)

    path_mid = pl.pallas_call(
        partial(_traceback_kernel, K=K, W=W, NC=NC),
        grid=(R // LANES, NC),
        in_specs=[
            pl.BlockSpec((K, W, LANES), lambda r, c: (NC - 1 - c, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), lambda r, c: (NC - 1 - c, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda r, c: (0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda r, c: (0, r),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, LANES), lambda r, c: (NC - 1 - c, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, R), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.int32)],
        interpret=interpret,
    )(tb, starts_T, seq_lens_p[None, :].astype(jnp.int32),
      sig_ends[None, :])

    # assemble (R, N0+1): path[0] = 0, path[seq_len] = sig_end
    path = jnp.concatenate(
        [
            jnp.zeros((R, 1), jnp.int32),
            path_mid.T[:, 1:N0],
            jnp.zeros((R, 1), jnp.int32),
        ],
        axis=1,
    )
    path = path.at[jnp.arange(R), seq_lens_p].set(sig_ends)
    return path[:R0], tb[:N0, :, :R0], None


def refine_batch_pallas(reads, sdp, algo="dwell_penalty", w_max=None,
                        interpret=False):
    """Host API: list of (norm_signal, levels, seq_band) -> list of
    int32 paths, via the single-launch Pallas kernels."""
    from remora_tpu.kernels.refine_dp import pad_reads_for_dp

    packed = pad_reads_for_dp(reads, w_max=w_max)
    path, _tb, _ = banded_dp_batch_pallas(
        jnp.asarray(packed["signal"]),
        jnp.asarray(packed["levels"]),
        jnp.asarray(packed["band_starts"]),
        jnp.asarray(packed["band_widths"]),
        jnp.asarray(packed["seq_lens"]),
        jnp.asarray(sdp, jnp.float32),
        algo=algo,
        w_max=packed["w_max"],
        interpret=interpret,
    )
    path = np.asarray(path)
    return [
        path[r, : packed["seq_lens"][r] + 1] for r in range(len(reads))
    ]
