"""Fused LSTM layer — forward AND backward — as Pallas TPU kernels.

The ConvLSTM's sequential hot op (reference ``models/ConvLSTM_w_ref.py``
uses ``nn.LSTM``). An XLA ``lax.scan`` re-launches the fused loop body
and round-trips h/c through HBM every step; hoisting the input
projection still materialises (T, B, 4H) pre-activation and gradient
tensors in HBM (~4x the layer's real traffic). These kernels run the
ENTIRE layer — input projection, bias, recurrence, and in backward the
weight/bias gradient accumulation — inside one program each:

  * grid (batch_tiles, time_chunks) with time as the inner (sequential)
    axis; each grid step covers KT timesteps (statically unrolled), so
    per-grid-step pipeline cost is amortized KT ways while Pallas
    double-buffers the (KT, BT, C) x blocks against compute;
  * one augmented matmul per step: gates = [x_t ; h_{t-1} ; 1] @ W_aug,
    W_aug = [W_ih^T ; W_hh^T ; b] stacked (C+H+1, 4H) and resident in
    VMEM — the constant-1 feature makes the bias gradient fall out of
    the weight gradient's last row for free;
  * h and c persist in VMEM scratch across the time chunks of a batch
    tile; all matmuls ride the MXU in the compute dtype (bf16 operands
    under mixed precision, f32 accumulation);
  * the backward kernel walks the time chunks in reverse (block index
    maps NC-1-c), recomputes gate pre-activations from the saved h/c
    states (no (T, B, 4H) residuals), emits dx directly, and
    accumulates dW_aug = sum_t [x;h;1]^T @ dgates into a VMEM-resident
    per-batch-tile output block;
  * saved h/c states ride in the compute dtype, halving residual HBM
    traffic under mixed precision (f32 runs stay exact).

``lstm_fused`` is a drop-in for ``models.layers.lstm`` wired up with
``jax.custom_vjp``; value and gradient parity vs the XLA scan is covered
in tests/test_refine_etl.py (interpret mode). On hardware, f32 matmuls
run at Precision.HIGHEST: the fused forward lands within 3.3e-5 of the
CPU f32 ground truth where the TPU XLA scan (default-precision bf16
passes) sits at 3.6e-3 — ~100x closer to true f32, as well as ~1.5x
faster end to end.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _tile_plan(B, C, H, itemsize, backward, want_cs=True):
    """Pick (BT, KT): LARGEST feasible batch tile, then time chunk.

    Sequential latency is NBT * T recurrence steps — a bigger batch tile
    directly cuts the sequential step count AND raises per-step MXU
    utilization, so BT dominates KT. Feasibility is EMPIRICAL, measured
    on v5e under the raised scoped-VMEM allowance (XLA's 16MB default
    is a budget, not the part's VMEM) at the production geometry
    (C=H=64, T~130,
    B=2048): Mosaic's kernel stack temporaries defy closed-form byte
    accounting — e.g. bwd (512, 8) compiles while the strictly-smaller-
    blocked (512, 4) OOMs — so the plan is a measured preference table,
    scaled down for wider layers. Measured bf16: fwd (2048,4) 1.50ms vs
    (512,16) before; f+b 2.95ms vs 3.43."""
    forced = os.environ.get(
        "REMORA_TPU_LSTM_TILE_BWD" if backward else "REMORA_TPU_LSTM_TILE"
    )
    if forced:
        bt, kt = (int(v) for v in forced.split(","))
        if B % bt == 0:
            return bt, kt
    if backward:
        # (1024, 8) compiles under the raised vmem_limit_bytes allowance
        # and measures ~1% faster than (512, 8) at production geometry
        prefs = (
            [(1024, 8), (512, 8), (256, 16), (128, 16)]
            if itemsize <= 2
            else [(128, 16), (64, 8)]
        )
    elif itemsize <= 2:
        # (2048, 4) used to trip the default scoped-vmem limit inside
        # larger jits on the want_cs (train fwd) path; the raised
        # vmem_limit_bytes allowance admits it and it measures ~1.5%
        # faster than (1024, 4)
        prefs = [(2048, 4), (1024, 4), (512, 8), (256, 8), (128, 8)]
    elif want_cs:
        prefs = [(512, 8), (256, 8), (128, 8)]
    else:
        prefs = [(1024, 4), (512, 8), (256, 8), (128, 8)]
    # scale batch tiles down by the per-row working set relative to the
    # measured geometry: x/h/dh blocks cost ~(C + 2H) per row and the
    # gate temporaries ~8H, all roughly linear in the row footprint
    row_cost = C + 10 * H
    scale = max(1, -(-row_cost // (64 + 10 * 64)))
    for BT, KT in prefs:
        BT //= scale
        if BT >= 8 and B % BT == 0:
            return BT, KT
    # tiny or odd batches: largest power-of-two tile dividing B
    for BT in (128, 64, 32, 16, 8, 4, 2, 1):
        if BT <= B and B % BT == 0:
            return BT, 4
    return 1, 4


def _dot(a, b):
    """MXU matmul, f32 accumulation. f32 operands force full-precision
    passes so f32 runs track the XLA scan bit-for-bit; bf16 operands are
    a single exact MXU pass anyway."""
    prec = (
        jax.lax.Precision.HIGHEST
        if a.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    return jnp.dot(
        a, b, precision=prec, preferred_element_type=jnp.float32
    )


def _split_gates(z, H):
    i = jax.nn.sigmoid(z[:, :H])
    f = jax.nn.sigmoid(z[:, H : 2 * H])
    g = jnp.tanh(z[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(z[:, 3 * H :])
    return i, f, g, o


def _interleave(default=1):
    """Independent row-chain count per batch tile. The recurrence is a
    strict matmul (MXU) -> gate math (VPU) -> matmul chain, so the two
    units can never overlap within one chain; splitting the batch tile
    into NI row-disjoint chains and interleaving their steps in program
    order lets the scheduler run chain j's matmul under chain j-1's gate
    math. REMORA_TPU_LSTM_NI overrides (1 = off)."""
    try:
        return max(1, int(os.environ.get("REMORA_TPU_LSTM_NI", default)))
    except ValueError:
        return default


def _fwd_kernel(x_ref, w_ref, hs_ref, cs_ref, h_sc, c_sc, xh_sc, *, C, H,
                KT, NI=1):
    """cs_ref is None on the inference-only path (no residual needed)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_sc[:] = jnp.zeros_like(h_sc)
        c_sc[:] = jnp.zeros_like(c_sc)
        xh_sc[:, C + H :] = jnp.ones_like(xh_sc[:, C + H :])

    BH = h_sc.shape[0] // NI
    sls = [slice(j * BH, (j + 1) * BH) for j in range(NI)]
    # the gate matmul contracts over [x; h] ONLY (C+H columns — exactly
    # one 128-wide MXU k-tile at the production C=H=64) with the bias
    # row added as a VPU broadcast; including the constant-1 column in
    # the contraction would push K to C+H+1 and double the k-tile count
    # of every serial step (measured ~2x the matmul time). The ones
    # column still lives in xh_sc for the backward's dW contraction,
    # whose M dim is not on the serial critical path.
    bias = w_ref[C + H, :][None, :]
    for k in range(KT):
        zs = [None] * NI
        for j, sl in enumerate(sls):
            xh_sc[sl, :C] = x_ref[k][sl].astype(xh_sc.dtype)
            xh_sc[sl, C : C + H] = h_sc[sl].astype(xh_sc.dtype)
            zs[j] = _dot(xh_sc[sl, : C + H], w_ref[: C + H]) + bias
        for j, sl in enumerate(sls):
            i, f, g, o = _split_gates(zs[j], H)
            c = f * c_sc[sl] + i * g
            h = o * jnp.tanh(c)
            h_sc[sl] = h
            c_sc[sl] = c
            hs_ref[k, sl] = h.astype(hs_ref.dtype)
            if cs_ref is not None:
                cs_ref[k, sl] = c.astype(cs_ref.dtype)


def _fwd_kernel_nocs(x_ref, w_ref, hs_ref, h_sc, c_sc, xh_sc, *, C, H, KT,
                     NI=1):
    _fwd_kernel(x_ref, w_ref, hs_ref, None, h_sc, c_sc, xh_sc, C=C, H=H,
                KT=KT, NI=NI)


def _fwd_kernel_last(x_ref, w_ref, hl_ref, h_sc, c_sc, xh_sc, *, C, H, KT,
                     T):
    """Inference-only forward emitting ONLY the final hidden state.

    The eval path consumes just h_{T-1} (the head reads the last
    timestep), so the (T, B, H) output write of the full kernel is pure
    HBM waste there. The single (1, BT, H) output block stays resident
    across the whole time walk. Unlike the full kernel, padding steps in
    the ragged tail MUST NOT touch the carries — the last real step's h
    is the result — so every update is gated on t_global < T.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_sc[:] = jnp.zeros_like(h_sc)
        c_sc[:] = jnp.zeros_like(c_sc)
        xh_sc[:, C + H :] = jnp.ones_like(xh_sc[:, C + H :])

    bias = w_ref[C + H, :][None, :]
    for k in range(KT):
        t_global = t * KT + k
        real = t_global < T
        xh_sc[:, :C] = jnp.where(
            real, x_ref[k].astype(xh_sc.dtype), 0
        )
        xh_sc[:, C : C + H] = h_sc[:].astype(xh_sc.dtype)
        z = _dot(xh_sc[:, : C + H], w_ref[: C + H]) + bias
        i, f, g, o = _split_gates(z, H)
        c = f * c_sc[:] + i * g
        h = o * jnp.tanh(c)
        h_sc[:] = jnp.where(real, h, h_sc[:])
        c_sc[:] = jnp.where(real, c, c_sc[:])
    hl_ref[0] = h_sc[:].astype(hl_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_last_call(x, w_aug, interpret=False):
    T, B, C = x.shape
    H = w_aug.shape[1] // 4
    BT, KT = _tile_plan(
        B, C, H, x.dtype.itemsize, backward=False, want_cs=False
    )
    CA = C + H + 1
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_last, C=C, H=H, KT=KT, T=T),
        grid=(B // BT, pl.cdiv(T, KT)),
        in_specs=[
            pl.BlockSpec((KT, BT, C), lambda b, t: (t, b, 0)),
            pl.BlockSpec((CA, 4 * H), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BT, H), lambda b, t: (0, b, 0)),
        out_shape=jax.ShapeDtypeStruct((1, B, H), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, CA), w_aug.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # allowance only (physical VMEM still binds): the default
            # scoped-vmem budget rejects tile plans that in fact fit,
            # e.g. the (2048, 4) forward tile inside the train jit
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w_aug)
    return out[0]


def _bwd_kernel(x_ref, hs_ref, hp_ref, cs_ref, cp_ref, dh_ref, w_ref,
                wt_ref, dx_ref, dw_ref, dh_sc, dc_sc, xh_sc, *, C, H, KT,
                NC, T, NI=1):
    g_idx = pl.program_id(1)
    first_chunk = g_idx == NC - 1  # time chunk 0 (reverse walk)

    @pl.when(g_idx == 0)
    def _init():
        dh_sc[:] = jnp.zeros_like(dh_sc)
        dc_sc[:] = jnp.zeros_like(dc_sc)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        xh_sc[:, C + H :] = jnp.ones_like(xh_sc[:, C + H :])

    BH = dh_sc.shape[0] // NI
    sls = [slice(j * BH, (j + 1) * BH) for j in range(NI)]
    zero = jnp.zeros((BH, H), dh_sc.dtype)
    bias = w_ref[C + H, :][None, :]
    for k in reversed(range(KT)):
        # T need not divide into KT chunks: the tail chunk's overhanging
        # steps read undefined block padding, so gate every carry/dW
        # update on the step being real (scalar select; the tail chunk
        # is walked FIRST in reverse, carries must stay exactly zero)
        t_global = (NC - 1 - g_idx) * KT + k
        real = t_global < T

        # chain-interleaved (see _interleave): phase 1 recomputes each
        # chain's gate pre-activations (MXU under the previous chain's
        # VPU work), phase 2 does the gate/cotangent math, phase 3 the
        # dxh/dW matmuls
        zs, cps = [None] * NI, [None] * NI
        for j, sl in enumerate(sls):
            if k == 0:
                # previous timestep lives in the preceding chunk —
                # fetched as a single-timestep slice (all-zero at the
                # first chunk: h_{-1} = c_{-1} = 0)
                h_prev = jnp.where(
                    first_chunk, zero, hp_ref[0, sl].astype(jnp.float32)
                )
                c_prev = jnp.where(
                    first_chunk, zero, cp_ref[0, sl].astype(jnp.float32)
                )
            else:
                h_prev = hs_ref[k - 1, sl].astype(jnp.float32)
                c_prev = cs_ref[k - 1, sl].astype(jnp.float32)

            # zero (not just mask) the off-end operands: padding garbage
            # may be non-finite, and NaN * 0 would still poison the dW
            # matmul
            xh_sc[sl, :C] = jnp.where(
                real, x_ref[k][sl].astype(xh_sc.dtype), 0
            )
            xh_sc[sl, C : C + H] = jnp.where(
                real, h_prev.astype(xh_sc.dtype), 0
            )
            zs[j] = _dot(xh_sc[sl, : C + H], w_ref[: C + H]) + bias
            cps[j] = c_prev
        dgs = [None] * NI
        for j, sl in enumerate(sls):
            i, f, g, o = _split_gates(zs[j], H)
            tanh_c = jnp.tanh(cs_ref[k, sl].astype(jnp.float32))

            dh = jnp.where(
                real, dh_ref[k][sl].astype(jnp.float32), 0.0
            ) + dh_sc[sl]
            do = dh * tanh_c
            dc = dc_sc[sl] + dh * o * (1.0 - tanh_c * tanh_c)
            dgi = dc * g * i * (1.0 - i)
            dgf = dc * cps[j] * f * (1.0 - f)
            dgg = dc * i * (1.0 - g * g)
            dgo = do * o * (1.0 - o)
            dgates = jnp.concatenate(
                [dgi, dgf, dgg, dgo], axis=1
            )
            dgs[j] = jnp.where(real, dgates, 0.0).astype(wt_ref.dtype)
            dc_sc[sl] = jnp.where(real, dc * f, dc_sc[sl])
        for j, sl in enumerate(sls):
            # d[x;h] = dgates @ [W_ih; W_hh]^T — the bias column is
            # sliced off the transposed weights BEFORE the matmul (its
            # cotangent is never used), keeping N at C+H = one MXU tile
            dxh = _dot(dgs[j], wt_ref[:, : C + H])
            dx_ref[k, sl] = dxh[:, :C].astype(dx_ref.dtype)
            dh_sc[sl] = dxh[:, C : C + H]
            # dW_aug += [x;h;1]^T @ dgates (bias row accumulates the
            # dgates sum)
            dw_ref[0] += jax.lax.dot_general(
                xh_sc[sl],
                dgs[j],
                (((0,), (0,)), ((), ())),
                precision=(
                    jax.lax.Precision.HIGHEST
                    if dgs[j].dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT
                ),
                preferred_element_type=jnp.float32,
            )


@functools.partial(
    jax.jit, static_argnames=("want_cs", "interpret", "ni")
)
def _fwd_call(x, w_aug, want_cs=True, interpret=False, ni=1):
    T, B, C = x.shape
    H = w_aug.shape[1] // 4
    BT, KT = _tile_plan(
        B, C, H, x.dtype.itemsize, backward=False, want_cs=want_cs
    )
    # T need not divide into KT chunks — the tail block's padding steps
    # only scribble on the carried h/c AFTER each batch tile's real
    # steps, and their hs/cs writes land in dropped block padding, so no
    # host-side pad/slice copies are needed (a (T,B,H) pad alone cost
    # ~0.8ms/step at production shapes)
    CA = C + H + 1
    out_spec = pl.BlockSpec((KT, BT, H), lambda b, t: (t, b, 0))
    out_shape = jax.ShapeDtypeStruct((T, B, H), x.dtype)
    n_out = 2 if want_cs else 1
    kernel = _fwd_kernel if want_cs else _fwd_kernel_nocs
    NI = ni if ni >= 1 and BT % ni == 0 else 1
    out = pl.pallas_call(
        functools.partial(kernel, C=C, H=H, KT=KT, NI=NI),
        grid=(B // BT, pl.cdiv(T, KT)),
        in_specs=[
            pl.BlockSpec((KT, BT, C), lambda b, t: (t, b, 0)),
            pl.BlockSpec((CA, 4 * H), lambda b, t: (0, 0)),
        ],
        out_specs=[out_spec] * n_out,
        out_shape=[out_shape] * n_out,
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, CA), w_aug.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # allowance only (physical VMEM still binds): the default
            # scoped-vmem budget rejects tile plans that in fact fit,
            # e.g. the (2048, 4) forward tile inside the train jit
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w_aug)
    if want_cs:
        return out[0], out[1]
    return out[0], None


@functools.partial(jax.jit, static_argnames=("interpret", "ni"))
def _bwd_call(x, w_aug, hs, cs, dhs, interpret=False, ni=1):
    T, B, C = x.shape
    H = w_aug.shape[1] // 4
    BT, KT = _tile_plan(B, C, H, x.dtype.itemsize, backward=True)
    NC = pl.cdiv(T, KT)
    NBT = B // BT
    CA = C + H + 1
    # ragged tail steps run FIRST in the reverse walk; the kernel gates
    # every carry/dW update on t < T so they contribute exactly zero
    rev = lambda b, c: (NC - 1 - c, b, 0)  # noqa: E731
    # single-timestep slice: last step of the preceding time chunk
    # (block shape 1 in time, so the index is an element index)
    rev_last = lambda b, c: (  # noqa: E731
        jnp.maximum((NC - 1 - c) * KT - 1, 0), b, 0
    )
    NI = ni if ni >= 1 and BT % ni == 0 else 1
    dx, dw_tiles = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C, H=H, KT=KT, NC=NC, T=T, NI=NI),
        grid=(NBT, NC),
        in_specs=[
            pl.BlockSpec((KT, BT, C), rev),
            pl.BlockSpec((KT, BT, H), rev),
            pl.BlockSpec((1, BT, H), rev_last),
            pl.BlockSpec((KT, BT, H), rev),
            pl.BlockSpec((1, BT, H), rev_last),
            pl.BlockSpec((KT, BT, H), rev),
            pl.BlockSpec((CA, 4 * H), lambda b, c: (0, 0)),
            pl.BlockSpec((4 * H, CA), lambda b, c: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((KT, BT, C), rev),
            pl.BlockSpec((1, CA, 4 * H), lambda b, c: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, C), x.dtype),
            jax.ShapeDtypeStruct((NBT, CA, 4 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, CA), w_aug.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # allowance only (physical VMEM still binds): the default
            # scoped-vmem budget rejects tile plans that in fact fit,
            # e.g. the (2048, 4) forward tile inside the train jit
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, hs, hs, cs, cs, dhs, w_aug, w_aug.T)
    return dx, jnp.sum(dw_tiles, axis=0)


# positional layout: (interpret, ni, x, w_aug) so the static flags can
# be nondiff argnums. ni (the chain-interleave count) is read from the
# env by the CALLER on every invocation and threaded through as a jit
# cache key — reading it at trace time inside the jitted calls would
# freeze the first value seen for the life of the process
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _lstm_core(interpret, ni, x, w_aug):
    hs, _ = _fwd_call(x, w_aug, want_cs=False, interpret=interpret, ni=ni)
    return hs


def _lstm_core_fwd(interpret, ni, x, w_aug):
    hs, cs = _fwd_call(x, w_aug, interpret=interpret, ni=ni)
    return hs, (x, w_aug, hs, cs)


def _lstm_core_bwd(interpret, ni, res, dhs):
    x, w_aug, hs, cs = res
    dx, dw = _bwd_call(x, w_aug, hs, cs, dhs, interpret=interpret, ni=ni)
    return dx, dw.astype(w_aug.dtype)


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


def lstm_fused(params, x, reverse=False, interpret=False):
    """Fused-kernel LSTM layer over (T, B, C); drop-in for layers.lstm.

    Differentiable end to end: dx / dW_ih / dW_hh / biases all come from
    the custom VJP (the bias gradient is the augmented weight gradient's
    last row, split back by the concat's autodiff).
    """
    C = x.shape[2]
    H = params["w_hh"].shape[1]
    bias = (params["b_ih"] + params["b_hh"]).reshape(1, 4 * H)
    w_aug = jnp.concatenate(
        [
            params["w_ih"].T.astype(x.dtype),
            params["w_hh"].T.astype(x.dtype),
            bias.astype(x.dtype),
        ],
        axis=0,
    )  # (C + H + 1, 4H)
    assert w_aug.shape[0] == C + H + 1
    if reverse:
        x = jnp.flip(x, axis=0)
    hs = _lstm_core(interpret, _interleave(), x, w_aug)
    if reverse:
        hs = jnp.flip(hs, axis=0)
    return hs


def lstm_last_fused(params, x, interpret=False):
    """Final hidden state h_{T-1} only, (B, H); inference path (no VJP).

    Drop-in for ``lstm(params, x)[-1]`` without materialising the
    (T, B, H) output in HBM.
    """
    C = x.shape[2]
    H = params["w_hh"].shape[1]
    bias = (params["b_ih"] + params["b_hh"]).reshape(1, 4 * H)
    w_aug = jnp.concatenate(
        [
            params["w_ih"].T.astype(x.dtype),
            params["w_hh"].T.astype(x.dtype),
            bias.astype(x.dtype),
        ],
        axis=0,
    )
    assert w_aug.shape[0] == C + H + 1
    return _fwd_last_call(x, w_aug, interpret=interpret)


def lstm_pallas(params, x, b_tile=None, interpret=False):
    """Back-compat alias (tiling is now chosen automatically)."""
    del b_tile
    return lstm_fused(params, x, interpret=interpret)


def default_to_fused():
    """Use the fused kernels when running on real TPU hardware (the
    interpret path would only slow CPU runs); REMORA_TPU_LSTM=fused|scan
    overrides. A ``jax.default_device`` scope takes precedence over the
    process default backend, so a CPU leg on a TPU-attached process
    (e.g. the bench baseline) correctly falls back to the scan."""
    mode = os.environ.get("REMORA_TPU_LSTM", "auto")
    if mode == "fused":
        return True
    if mode == "scan":
        return False
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            plat = dd if isinstance(dd, str) else getattr(
                dd, "platform", None
            )
            if plat is not None:
                return plat not in ("cpu",)
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
