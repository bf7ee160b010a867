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
  * the in-band stay recurrence runs as an exact sequential row fold
    (grouped 8 rows per loop step), reproducing the reference C float
    association bit-for-bit — large-band near-ties resolve identically
    to the Cython, unlike a reassociating prefix scan;
  * the per-read band realignment prev[p - 1 + bsd] (bsd varies per
    lane) is a masked select over the W + 1 possible sublane shifts —
    cheap on (16, 128) tiles inside the kernel;
  * traceback is a second Pallas kernel walking the chunks in reverse
    with the per-read path position carried in scratch.

Path-exact against tests/oracle_dp.py (the line-for-line oracle of the
reference Cython) and the native C++ kernel, including long reads with
wide bands; tested in tests/test_kernels.py.
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


def _stay_fold(base_ref, cand_ref, ctb_ref, out_s_ref, out_t_ref, W,
               p0c=None, n_groups=None, w_mask=None):
    """Exact sequential stay-chain fold over the band rows.

    Reproduces the reference Cython's left-to-right recurrence bit-for-
    bit: ``stay = carry + base[p]`` with the candidate taken on strict
    improvement (``p0c is None``), or taken unconditionally below the
    per-lane row threshold ``p0c`` (the past-band stay-only suffix).
    Writes scores/tb per row; rows processed in groups of 8.

    ``n_groups`` (traced) bounds the fold to the rows any lane actually
    needs THIS base: real-read bands vary per base (median ~110, p99
    ~290 at the default settings — PERF.md round 4), and this fold is
    the kernel's serial bottleneck, so iterating to the static padded W
    for every base costs ~2x the needed work. Rows past the bound keep
    stale scratch — the move/dwell candidate builders mask prev rows by
    ``prev_valid``, so stale rows are never read as valid.

    ``w_mask`` (1, LANES): when set, score writes past a lane's band
    width land as BIG (what the old full-(W, LANES) post-mask did, but
    only over the folded rows). The carry itself stays unmasked — rows
    past ``w`` have base 0 / candidate BIG, so the carry is unchanged,
    exactly as the reference walks them. ``out_s_ref``/``out_t_ref``
    may ALIAS ``base_ref``-side inputs: each row is read before it is
    written, and the fold visits each row exactly once.
    """
    G = 8

    def group(b, carry):
        cs, ct = carry
        for g in range(G):
            i = b * G + g
            base_i = base_ref[pl.ds(i, 1)]
            cand_i = cand_ref[pl.ds(i, 1)]
            ctb_i = ctb_ref[pl.ds(i, 1)]
            stay = cs + base_i
            if p0c is None:
                take_cand = cand_i < stay
            else:
                take_cand = i < p0c
            cs = jnp.where(take_cand, cand_i, stay)
            ct = jnp.where(take_cand, ctb_i, ct + 1)
            if w_mask is None:
                out_s_ref[pl.ds(i, 1)] = cs
            else:
                out_s_ref[pl.ds(i, 1)] = jnp.where(i < w_mask, cs, BIG)
            out_t_ref[pl.ds(i, 1)] = ct
        return cs, ct

    jax.lax.fori_loop(
        0,
        W // G if n_groups is None else n_groups,
        group,
        (
            jnp.full((1, LANES), jnp.inf, jnp.float32),
            jnp.zeros((1, LANES), jnp.int32),
        ),
    )


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


def _move_entries(prev_g, prev_valid, prev_last, base, bsd, w):
    """Per-row move candidates + their tb codes (reference ``vit_step``
    entry/move semantics; the stay chain is applied by _stay_fold)."""
    rows = _rows(base.shape)
    src = rows - 1 + bsd
    src_ok = (src >= 0) & (src < prev_valid)
    mv = jnp.where(src_ok, prev_g + base, BIG)
    sentinel = LARGE_SCORE + prev_last
    at_entry = (rows == 0) & (bsd == 0)
    mv = jnp.where(at_entry, sentinel, mv)
    move_limit = jnp.minimum(prev_valid - bsd, w - 1)
    mv = jnp.where((rows <= move_limit) | (rows == 0), mv, BIG)
    mv = jnp.where(rows < w, mv, BIG)
    mv_tb = jnp.where(at_entry, -1, 0).astype(jnp.int32)
    return mv, mv_tb


def _dwell_candidates(prev_g, prev_valid, prev_last, base, bsd, w,
                      sdp_vals, unpen, unpen_tb):
    """Dwell-penalty candidates for the main band region (reference
    ``dwell_step``): short-dwell moves in ascending dwell order with
    strict improvement, then the unpenalized long-dwell fallback. The
    running base sums accumulate low-index-last, matching the C float
    association exactly."""
    L = len(sdp_vals)
    rows = _rows(base.shape)
    in_band = rows < w

    invalid = LARGE_SCORE + prev_last
    curr = jnp.broadcast_to(invalid, base.shape)
    tb = jnp.full(base.shape, -1, jnp.int32)

    p0 = prev_valid - bsd + L
    main = rows < p0
    entry_blocked = (rows == 0) & (bsd == 0)

    run = base
    for d in range(L):
        if d > 0:
            run = run + _shift_down(base, d, jnp.float32(0))
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
        cand = prev_gd + run + sdp_vals[d]
        upd = valid & (cand < curr)
        curr = jnp.where(upd, cand, curr)
        tb = jnp.where(upd, d, tb)

    long_ok = main & in_band & (rows >= L)
    cand = _shift_down(unpen, L, BIG) + run
    upd = long_ok & (cand < curr)
    curr = jnp.where(upd, cand, curr)
    tb = jnp.where(upd, _shift_down(unpen_tb, L, jnp.int32(0)) + L, tb)
    return curr, tb, jnp.maximum(p0, 1)


def _extract_band(stage_cols, offs, W, nbits):
    """band[j, r] = stage_cols[offs[r] + j, r] via per-lane binary-
    decomposition sublane shifts."""
    cur = stage_cols
    for b in range(nbits):
        amt = 1 << b
        if amt >= stage_cols.shape[0]:
            break
        shifted = _shift_up(cur, amt, np.float32(0))
        cur = jnp.where((offs & amt) != 0, shifted, cur)
    return cur[:W]


def _tb_dma(tb_hbm, tbs_ref, dma_sem, lane_lo, n_glob, slot):
    """Descriptor for the per-base traceback-row copy (staging slot <->
    tb_hbm[n_glob]); built identically at start and wait sites."""
    return pltpu.make_async_copy(
        tbs_ref.at[slot],
        tb_hbm.at[n_glob, :, pl.ds(lane_lo, LANES)],
        dma_sem.at[slot],
    )


def _forward_kernel(sdp_ref, stage_ref, seglo_ref, st_ref, wd_ref,
                    lv_ref, tb_hbm, prev_ref, meta_ref, b_ref, mv_ref,
                    ti_ref, tbs_ref, dma_sem, *rest, K, W, L, SEG, NBITS,
                    NC, dwell):
    """One (read-tile, base-chunk) grid step of the forward DP.

    Band costs are built INSIDE the kernel from a per-chunk staged
    signal window (SEG, LANES): the per-base band is extracted with
    per-lane binary sublane shifts, and every stay-chain recurrence runs
    as an exact sequential row fold (_stay_fold) — bit-identical to the
    reference Cython/native C float association — so no (N, W, R) cost
    tensors ever exist in HBM and no prefix-scan reassociation occurs.

    The per-base traceback row leaves the kernel by MANUAL DMA: the
    fold writes scores into ``prev_ref`` (carried) and tb codes into
    ``ti_ref`` in place, which is converted to an int16 staging slot
    (2-deep, double-buffered) and async-copied to the unblocked HBM
    output ``tb_hbm[n, :, lane-tile]``. VMEM therefore holds W-scale
    scratch ONLY — no (K, W, LANES) output block — which is what lifts
    the band cap from 1024 (the round-4 scoped-VMEM wall) to 2048+.

    Scratch: prev (W, LANES) f32 carried scores; meta (8, LANES) i32
    rows 0/1 = prev band start / prev band width; b/mv f32 and ti i32
    (W, LANES) fold workspaces; tbs (2, W, LANES) i16 DMA staging;
    dwell adds sc f32 / ts i32 (the unpenalized-pass outputs).
    """
    sc_ref, ts_ref = rest if dwell else (None, None)
    r = pl.program_id(0)
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        prev_ref[:] = jnp.full((W, LANES), BIG, jnp.float32)
        prev_ref[0, :] = jnp.zeros((LANES,), jnp.float32)
        # spoofed carry: prev_start = st[0] - 1 (bsd = 1), width = w[0]
        meta_ref[0, :] = st_ref[0, :] - 1
        meta_ref[1, :] = wd_ref[0, :]

    stage_cols = stage_ref[0]
    seg_lo = seglo_ref[0, 0, :][None, :]
    sdp_vals = [sdp_ref[0, d] for d in range(L)] if dwell else []
    band_rows = _rows((W, LANES))
    lane_lo = r * LANES

    def body(k, _):
        st = st_ref[k, :][None, :]
        w = wd_ref[k, :][None, :]
        level = lv_ref[k, :][None, :]
        prev = prev_ref[:]
        prev_start = meta_ref[0, :][None, :]
        prev_valid = meta_ref[1, :][None, :]
        bsd = st - prev_start

        band_sig = _extract_band(stage_cols, st - seg_lo, W, NBITS)
        diff = band_sig - level
        base = jnp.where(band_rows < w, diff * diff, np.float32(0))
        b_ref[:] = base

        prev_last = _select_row(prev, prev_valid - 1)
        prev_g = _band_align(prev, bsd)

        # fold only the rows any lane needs at THIS base (see _stay_fold)
        n_groups = (jnp.max(w) + 7) // 8

        # Viterbi pass (also the dwell algo's unpenalized fallback):
        # per-row move candidates, then the exact stay-chain fold.
        # prev_ref is dead once the candidates exist (prev/prev_g/
        # prev_last are SSA values), so the fold writes scores straight
        # into it; tb codes overwrite the candidate-tb rows in place.
        mv, mv_tb = _move_entries(prev_g, prev_valid, prev_last, base,
                                  bsd, w)
        mv_ref[:] = mv
        ti_ref[:] = mv_tb
        if dwell:
            _stay_fold(b_ref, mv_ref, ti_ref, sc_ref, ts_ref, W,
                       n_groups=n_groups)
            unpen = sc_ref[:]
            unpen_tb = ts_ref[:]
            curr, tb, p0c = _dwell_candidates(
                prev_g, prev_valid, prev_last, base, bsd, w, sdp_vals,
                unpen, unpen_tb,
            )
            # past-band stay-only suffix: exact chain from the last
            # main-region row
            mv_ref[:] = curr
            ti_ref[:] = tb
            _stay_fold(b_ref, mv_ref, ti_ref, prev_ref, ti_ref, W,
                       p0c=p0c, n_groups=n_groups, w_mask=w)
        else:
            _stay_fold(b_ref, mv_ref, ti_ref, prev_ref, ti_ref, W,
                       n_groups=n_groups, w_mask=w)

        # DMA the int16 traceback row out from a double-buffered slot
        n_glob = chunk * K + k
        slot = jax.lax.rem(n_glob, 2)

        @pl.when((chunk > 0) | (k >= 2))
        def _drain_slot():
            # the copy started two bases ago on this slot
            _tb_dma(tb_hbm, tbs_ref, dma_sem, lane_lo, n_glob - 2,
                    slot).wait()

        tbs_ref[slot] = ti_ref[:].astype(jnp.int16)
        _tb_dma(tb_hbm, tbs_ref, dma_sem, lane_lo, n_glob, slot).start()

        meta_ref[0, :] = st[0]
        meta_ref[1, :] = w[0]
        return 0

    jax.lax.fori_loop(0, K, body, 0)

    # the last chunk of each read tile drains both in-flight DMAs so no
    # copy outlives the program (slots were both started: K*NC >= 2)
    @pl.when(chunk == NC - 1)
    def _drain_all():
        last = NC * K - 1
        for n_glob in (last - 1, last):
            _tb_dma(tb_hbm, tbs_ref, dma_sem, lane_lo, n_glob,
                    jax.lax.rem(n_glob, 2)).wait()


def _traceback_kernel(tb_hbm, st_ref, lens_ref, ends_ref, path_ref,
                      pos_ref, tbv_ref, dma_sem, *, K, W, NC):
    """Reverse walk over chunks; pos_ref (8, LANES) i32 row 0 carries the
    next base's path value.

    Traceback rows stream in per base by manual DMA from the unblocked
    HBM tensor into a 2-deep staging buffer (the next base's row is
    prefetched while the current base is processed), so — like the
    forward kernel — VMEM never holds a (K, W, LANES) block and the
    band cap no longer couples to the base-chunk size."""
    r = pl.program_id(0)
    c = pl.program_id(1)
    lane_lo = r * LANES
    base0 = (NC - 1 - c) * K

    def fetch(base_idx, slot):
        return pltpu.make_async_copy(
            tb_hbm.at[base_idx, :, pl.ds(lane_lo, LANES)],
            tbv_ref.at[slot],
            dma_sem.at[slot],
        )

    @pl.when(c == 0)
    def _init():
        pos_ref[0, :] = ends_ref[0, :]
        # warm up: start the first (highest-index) base's fetch
        fetch(NC * K - 1, jax.lax.rem(NC * K - 1, 2)).start()

    def body(k, _):
        kk = K - 1 - k
        base_idx = base0 + kk
        slot = jax.lax.rem(base_idx, 2)

        # prefetch the next (lower) base while this one is awaited
        @pl.when(base_idx > 0)
        def _prefetch():
            fetch(base_idx - 1, jax.lax.rem(base_idx - 1, 2)).start()

        fetch(base_idx, slot).wait()
        nxt = pos_ref[0, :][None, :]
        lookup = nxt - 1
        off = jnp.clip(lookup - st_ref[kk, :][None, :], 0, W - 1)
        tb_k = tbv_ref[slot]
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
    static_argnames=("algo", "w_max", "K", "SEG", "interpret"),
)
def _dp_jit(signal, levels, band_starts, band_widths, seq_lens, sdp,
            algo, w_max, K, SEG, interpret):
    R0, N0 = levels.shape
    W = int(np.ceil(max(w_max, 8) / 8)) * 8
    NBITS = max(1, int(np.ceil(np.log2(SEG))))
    dwell = algo == "dwell_penalty"
    L = int(sdp.shape[0])

    # pad reads to full lanes and bases to full chunks
    R = int(np.ceil(R0 / LANES)) * LANES
    NC = int(np.ceil(N0 / K))
    N = NC * K
    last_start = band_starts[:, -1:]
    band_starts = _pad_to(_pad_to(band_starts, R, 0, 0), N, 1, 0)
    if N > N0:
        # padding bases keep a width-1 band anchored at the read end
        band_starts = band_starts.at[:R0, N0:].set(last_start)
    band_widths = _pad_to(_pad_to(band_widths, R, 0, 1), N, 1, 1)
    levels_p = _pad_to(_pad_to(levels, R, 0, 0.0), N, 1, 0.0)
    signal_p = _pad_to(_pad_to(signal, R, 0, 0.0),
                       signal.shape[1] + SEG, 1, 0.0)
    seq_lens_p = _pad_to(jnp.maximum(seq_lens, 1), R, 0, 1)

    starts_T = band_starts.T.astype(jnp.int32)
    widths_T = band_widths.T.astype(jnp.int32)
    levels_T = levels_p.T.astype(jnp.float32)
    sdp_2d = jnp.asarray(sdp, jnp.float32)[None, :]

    # stage per-(chunk, read) signal windows: a (NC, SEG, R) gather —
    # ~7x smaller than gathering per-base (N, W, R) band tensors; the
    # kernel slices bands out of these windows with sublane shifts
    seg_lo_rows = starts_T[::K]  # (NC, R): per-chunk window base
    signal_T = signal_p.T
    qvec = jnp.arange(SEG)[:, None]

    def window(lo):
        idx = jnp.clip(lo[None, :] + qvec, 0, signal_T.shape[0] - 1)
        return jnp.take_along_axis(signal_T, idx, axis=0)

    stage = jax.vmap(window)(seg_lo_rows)  # (NC, SEG, R)
    seg_lo = seg_lo_rows[:, None, :]  # (NC, 1, R) for the kernel

    grid = (R // LANES, NC)
    fwd_scratch = [
        pltpu.VMEM((W, LANES), jnp.float32),   # prev
        pltpu.VMEM((8, LANES), jnp.int32),     # meta
        pltpu.VMEM((W, LANES), jnp.float32),   # b
        pltpu.VMEM((W, LANES), jnp.float32),   # mv
        pltpu.VMEM((W, LANES), jnp.int32),     # ti
        pltpu.VMEM((2, W, LANES), jnp.int16),  # tb DMA staging
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if dwell:
        fwd_scratch += [
            pltpu.VMEM((W, LANES), jnp.float32),  # sc (unpen scores)
            pltpu.VMEM((W, LANES), jnp.int32),    # ts (unpen tb)
        ]
    tb = pl.pallas_call(
        partial(_forward_kernel, K=K, W=W, L=L, SEG=SEG, NBITS=NBITS,
                NC=NC, dwell=dwell),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SEG, LANES), lambda r, c: (c, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda r, c: (c, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), lambda r, c: (c, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), lambda r, c: (c, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), lambda r, c: (c, r),
                         memory_space=pltpu.VMEM),
        ],
        # unblocked HBM output, written by per-base DMA from staging
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, W, R), jnp.int16),
        scratch_shapes=fwd_scratch,
        compiler_params=pltpu.CompilerParams(
            # allowance only (physical VMEM still binds): the DEFAULT
            # scoped-vmem budget (16M) rejects kilowide-band geometries
            # whose fold scratch + Mosaic stack temporaries in fact fit
            # (W=2040 dwell needs ~17.2M; measured OOM without this)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(sdp_2d, stage, seg_lo, starts_T, widths_T, levels_T)

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
            # unblocked: per-base rows stream in by prefetching DMA
            pl.BlockSpec(memory_space=pl.ANY),
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
        scratch_shapes=[
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.VMEM((2, W, LANES), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
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


def compute_chunk_seg(band_starts, band_widths, seq_lens, K, w_pad):
    """Static per-call signal staging width: the max signal span any
    (read, K-base chunk) touches, rounded up to full lanes."""
    starts = np.asarray(band_starts)
    widths = np.asarray(band_widths)
    R, N = starts.shape
    NC = int(np.ceil(N / K))
    span = 0
    for c in range(NC):
        lo = starts[:, c * K]
        hi_idx = min((c + 1) * K, N) - 1
        hi = starts[:, hi_idx] + widths[:, hi_idx]
        span = max(span, int((hi - lo).max()))
    span = max(span, w_pad + 8)
    return int(np.ceil(span / 8)) * 8


def banded_dp_batch_pallas(signal, levels, band_starts, band_widths,
                           seq_lens, sdp, algo="dwell_penalty", w_max=16,
                           chunk_bases=16, interpret=False, seg=None):
    """Forward + traceback for a batch of reads, one launch each.

    Same contract as refine_dp.banded_dp_batch: returns
    (path (R, N+1), traceback, final_scores placeholder). The traceback
    is the raw PADDED device tensor (N and R rounded up to the staging
    buckets) — trimming it would copy multi-GB of data no caller reads.
    Host-side wrapper computing the static staging geometry. Pass
    ``seg`` (max per-chunk signal span, from compute_chunk_seg) to skip
    the host scan over the band arrays, e.g. when they already live on
    device.
    """
    # quantize the static geometry (W to 8 sublanes, SEG to 128) so
    # consecutive batches with slightly different band shapes reuse the
    # same compiled executable instead of recompiling per batch
    W = int(np.ceil(max(w_max, 8) / 8)) * 8
    K = max(8, (int(chunk_bases) // 8) * 8)
    # traceback rows leave the kernel by per-base DMA (2-deep staging),
    # so K no longer multiplies W in scoped VMEM — no K*W clamp needed
    # (the round-4 (K, W, LANES) output block was what forced K*W<=8192
    # and capped the band at 1024)
    if seg is None:
        seg = compute_chunk_seg(band_starts, band_widths, seq_lens, K, W)
        while seg > 4096 and K > 8:
            K -= 8
            seg = compute_chunk_seg(
                band_starts, band_widths, seq_lens, K, W
            )
    # 512-multiple staging widths: batch-to-batch band-geometry jitter
    # otherwise lands on a fresh SEG (a static kernel arg) every launch
    # — compile keys, not staging bytes, are the scarce resource
    SEG = int(np.ceil(max(int(seg), W + 8) / 512)) * 512

    # bucket the traced shapes too (reads to full 128-lane tiles, bases
    # to 256, signal to 4096 cols) so batch-to-batch shape jitter stays
    # inside one compiled executable; device-side pads so
    # device-resident inputs never round-trip
    band_starts = jnp.asarray(band_starts)
    band_widths = jnp.asarray(band_widths)
    levels = jnp.asarray(levels)
    signal = jnp.asarray(signal)
    seq_lens = jnp.asarray(seq_lens)
    R0 = levels.shape[0]
    RB = int(np.ceil(max(R0, 1) / LANES)) * LANES
    if RB > R0:
        band_starts = _pad_to(band_starts, RB, 0, 0)
        band_widths = _pad_to(band_widths, RB, 0, 1)
        levels = _pad_to(levels, RB, 0, 0.0)
        signal = _pad_to(signal, RB, 0, 0.0)
        seq_lens = _pad_to(jnp.maximum(seq_lens, 1), RB, 0, 1)
    N0 = levels.shape[1]
    NB = int(np.ceil(N0 / 256)) * 256
    if NB > N0:
        last = band_starts[:, -1:]
        band_starts = jnp.concatenate(
            [band_starts, jnp.repeat(last, NB - N0, 1)], 1
        )
        band_widths = _pad_to(band_widths, NB, 1, 1)
        levels = _pad_to(levels, NB, 1, 0.0)
    SB = int(np.ceil(signal.shape[1] / 4096)) * 4096
    signal = _pad_to(signal, SB, 1, 0.0)
    path, tb, scores = _dp_jit(
        signal,
        levels,
        band_starts,
        band_widths,
        seq_lens,
        jnp.asarray(sdp, jnp.float32),
        algo,
        W,
        K,
        SEG,
        interpret,
    )
    if NB > N0:
        # trim the base-axis bucketing back off; path[seq_len] already
        # carries the per-read signal end so column N0 is only needed
        # for reads of exactly N0 bases, which the slice keeps
        path = path[:, : N0 + 1]
    if RB > R0:
        path = path[:R0]
    # the traceback returns UNTRIMMED: no caller reads it (the path is
    # the product), and slicing it would materialize a second multi-GB
    # device copy of a tensor that is about to be dropped — at the
    # budget-guard limit that transient alone could OOM the chip
    return path, tb, scores


def refine_batch_pallas(reads, sdp, algo="dwell_penalty", w_max=None,
                        interpret=False):
    """Host API: list of (norm_signal, levels, seq_band) -> list of
    int32 paths, via the single-launch Pallas kernels."""
    from remora_tpu.kernels.refine_dp import pad_reads_for_dp

    packed = pad_reads_for_dp(reads, w_max=w_max)
    path, _tb, _ = banded_dp_batch_pallas(
        packed["signal"],
        packed["levels"],
        packed["band_starts"],
        packed["band_widths"],
        packed["seq_lens"],
        jnp.asarray(sdp, jnp.float32),
        algo=algo,
        w_max=packed["w_max"],
        interpret=interpret,
    )
    path = np.asarray(path)
    return [
        path[r, : packed["seq_lens"][r] + 1] for r in range(len(reads))
    ]
