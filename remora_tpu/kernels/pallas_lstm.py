"""Fused LSTM scan — forward AND backward — as Pallas TPU kernels.

The ConvLSTM's sequential hot op (reference ``models/ConvLSTM_w_ref.py``
uses ``nn.LSTM``; here the input projection x @ W_ih^T for all T steps
is one big MXU matmul outside, so the recurrence carries only
h @ W_hh^T). An XLA ``lax.scan`` re-launches the fused loop body and
round-trips h/c through HBM every step, costing a fixed per-step
overhead — several ms of a 2048-chunk training step. These kernels
instead run the whole time loop inside ONE program each:

  * grid (batch_tiles, time_chunks) with time as the inner (sequential)
    axis; each grid step covers KT timesteps (statically unrolled), so
    the per-grid-step pipeline cost is amortized KT ways while Pallas
    double-buffers the (KT, BT, 4H) x_proj blocks against compute;
  * h and c persist in VMEM scratch across the time chunks of a batch
    tile; the recurrent (BT, H) @ (H, 4H) matmul rides the MXU in the
    compute dtype (bf16 operands under mixed precision, f32 accum);
  * the backward kernel walks the time chunks in reverse (block index
    maps NC-1-c), recomputes the gate pre-activations from the saved
    h/c states (cheaper than materialising (T, B, 4H) gate activations
    in HBM), and carries dh/dc in VMEM scratch;
  * saved h/c states and dx_proj ride in the compute dtype, halving
    residual HBM traffic under mixed precision (f32 runs stay exact);
  * dW_hh and the bias/input-projection gradients fall out of dx_proj
    via two large one-shot matmuls outside the kernels.

``lstm_fused`` is a drop-in for ``models.layers.lstm`` wired up with
``jax.custom_vjp``; gradient parity vs the XLA scan is covered in
tests/test_refine_etl.py (interpret mode) and was verified bit-identical
(forward) / ~1e-5 (grads) on hardware.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 11 * 1024 * 1024


def _tile_plan(B, H, itemsize, backward):
    """Pick (BT, KT): largest batch tile and 16-step time chunks whose
    double-buffered block working set stays inside VMEM."""
    for KT in (16, 8):
        for BT in (1024, 512, 256, 128):
            if B % BT:
                continue
            x_blk = KT * BT * 4 * H * itemsize
            s_blk = KT * BT * H * itemsize
            if backward:
                # xp + dxp + (hs, hs_prev, cs, cs_prev, dhs) + scratch
                need = 2 * (2 * x_blk + 5 * s_blk) + 2 * BT * H * 4
            else:
                # xp + (hs, cs) out + scratch
                need = 2 * (x_blk + 2 * s_blk) + 2 * BT * H * 4
            if need <= _VMEM_BUDGET:
                return BT, KT
    return min(B, 128), 8


def _gates(xp, h, c_prev, w_ref, H):
    """Shared gate math: pre-activations -> (i, f, g, o, c)."""
    z = xp + jnp.dot(
        h.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32
    )
    i = jax.nn.sigmoid(z[:, :H])
    f = jax.nn.sigmoid(z[:, H : 2 * H])
    g = jnp.tanh(z[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(z[:, 3 * H :])
    c = f * c_prev + i * g
    return i, f, g, o, c


def _fwd_kernel(xp_ref, w_ref, hs_ref, cs_ref, h_sc, c_sc, *, H, KT):
    """cs_ref is None on the inference-only path (no residual needed)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_sc[:] = jnp.zeros_like(h_sc)
        c_sc[:] = jnp.zeros_like(c_sc)

    for k in range(KT):
        xp = xp_ref[k].astype(jnp.float32)
        i, f, g, o, c = _gates(xp, h_sc[:], c_sc[:], w_ref, H)
        h = o * jnp.tanh(c)
        h_sc[:] = h
        c_sc[:] = c
        hs_ref[k] = h.astype(hs_ref.dtype)
        if cs_ref is not None:
            cs_ref[k] = c.astype(cs_ref.dtype)


def _bwd_kernel(xp_ref, hs_ref, hp_ref, cs_ref, cp_ref, dh_ref, w_ref,
                wt_ref, dxp_ref, dh_sc, dc_sc, *, H, KT, NC):
    g_idx = pl.program_id(1)
    first_chunk = g_idx == NC - 1  # time chunk 0 (reverse walk)

    @pl.when(g_idx == 0)
    def _init():
        dh_sc[:] = jnp.zeros_like(dh_sc)
        dc_sc[:] = jnp.zeros_like(dc_sc)

    zero = jnp.zeros_like(dh_sc)
    for k in reversed(range(KT)):
        if k == 0:
            # previous timestep lives in the preceding chunk (all-zero
            # at the first chunk: h_{-1} = c_{-1} = 0)
            h_prev = jnp.where(
                first_chunk, zero, hp_ref[KT - 1].astype(jnp.float32)
            )
            c_prev = jnp.where(
                first_chunk, zero, cp_ref[KT - 1].astype(jnp.float32)
            )
        else:
            h_prev = hs_ref[k - 1].astype(jnp.float32)
            c_prev = cs_ref[k - 1].astype(jnp.float32)

        xp = xp_ref[k].astype(jnp.float32)
        i, f, g, o, _c = _gates(xp, h_prev, c_prev, w_ref, H)
        tanh_c = jnp.tanh(cs_ref[k].astype(jnp.float32))

        dh = dh_ref[k].astype(jnp.float32) + dh_sc[:]
        do = dh * tanh_c
        dc = dc_sc[:] + dh * o * (1.0 - tanh_c * tanh_c)
        dgi = dc * g * i * (1.0 - i)
        dgf = dc * c_prev * f * (1.0 - f)
        dgg = dc * i * (1.0 - g * g)
        dgo = do * o * (1.0 - o)
        dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=1)

        dxp_ref[k] = dgates.astype(dxp_ref.dtype)
        dh_sc[:] = jnp.dot(
            dgates.astype(wt_ref.dtype),
            wt_ref[:],
            preferred_element_type=jnp.float32,
        )
        dc_sc[:] = dc * f


def _pad_time(x, Tp):
    T = x.shape[0]
    if Tp == T:
        return x
    return jnp.pad(x, ((0, Tp - T),) + ((0, 0),) * (x.ndim - 1))


def _fwd_kernel_nocs(xp_ref, w_ref, hs_ref, h_sc, c_sc, *, H, KT):
    _fwd_kernel(xp_ref, w_ref, hs_ref, None, h_sc, c_sc, H=H, KT=KT)


@functools.partial(jax.jit, static_argnames=("want_cs", "interpret"))
def _fwd_call(x_proj, w_hh_t, want_cs=True, interpret=False):
    T, B, H4 = x_proj.shape
    H = H4 // 4
    BT, KT = _tile_plan(B, H, x_proj.dtype.itemsize, backward=False)
    Tp = -(-T // KT) * KT
    # zero-padded tail steps only scribble on the carried h/c AFTER the
    # real steps of each batch tile; their outputs are sliced off
    xp = _pad_time(x_proj, Tp)
    out_spec = pl.BlockSpec((KT, BT, H), lambda b, t: (t, b, 0))
    out_shape = jax.ShapeDtypeStruct((Tp, B, H), x_proj.dtype)
    n_out = 2 if want_cs else 1
    kernel = _fwd_kernel if want_cs else _fwd_kernel_nocs
    out = pl.pallas_call(
        functools.partial(kernel, H=H, KT=KT),
        grid=(B // BT, Tp // KT),
        in_specs=[
            pl.BlockSpec((KT, BT, H4), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0)),
        ],
        out_specs=[out_spec] * n_out,
        out_shape=[out_shape] * n_out,
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w_hh_t)
    if want_cs:
        return out[0][:T], out[1][:T]
    return out[0][:T], None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(x_proj, w_hh_t, hs, cs, dhs, interpret=False):
    T, B, H4 = x_proj.shape
    H = H4 // 4
    BT, KT = _tile_plan(B, H, x_proj.dtype.itemsize, backward=True)
    Tp = -(-T // KT) * KT
    NC = Tp // KT
    # zero-padded tail steps run FIRST in the reverse walk; with zero
    # dhs and zero-initialized dh/dc carries every gradient term there
    # is exactly zero, so real steps are untouched
    xp = _pad_time(x_proj, Tp)
    hs = _pad_time(hs, Tp)
    cs = _pad_time(cs, Tp)
    dhs = _pad_time(dhs, Tp)
    rev = lambda b, c: (NC - 1 - c, b, 0)  # noqa: E731
    rev_prev = lambda b, c: (jnp.maximum(NC - 2 - c, 0), b, 0)  # noqa: E731
    dxp = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, KT=KT, NC=NC),
        grid=(B // BT, NC),
        in_specs=[
            pl.BlockSpec((KT, BT, H4), rev),
            pl.BlockSpec((KT, BT, H), rev),
            pl.BlockSpec((KT, BT, H), rev_prev),
            pl.BlockSpec((KT, BT, H), rev),
            pl.BlockSpec((KT, BT, H), rev_prev),
            pl.BlockSpec((KT, BT, H), rev),
            pl.BlockSpec((H, H4), lambda b, c: (0, 0)),
            pl.BlockSpec((H4, H), lambda b, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((KT, BT, H4), rev),
        out_shape=jax.ShapeDtypeStruct((Tp, B, H4), x_proj.dtype),
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, hs, hs, cs, cs, dhs, w_hh_t, w_hh_t.T)
    return dxp[:T]


# positional layout: (interpret, x_proj, w_hh_t) so the static flag can
# be a nondiff argnum
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lstm_core(interpret, x_proj, w_hh_t):
    hs, _ = _fwd_call(x_proj, w_hh_t, want_cs=False, interpret=interpret)
    return hs


def _lstm_core_fwd(interpret, x_proj, w_hh_t):
    hs, cs = _fwd_call(x_proj, w_hh_t, interpret=interpret)
    return hs, (x_proj, w_hh_t, hs, cs)


def _lstm_core_bwd(interpret, res, dhs):
    x_proj, w_hh_t, hs, cs = res
    dxp = _bwd_call(x_proj, w_hh_t, hs, cs, dhs, interpret=interpret)
    hs_prev = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], axis=0)
    dw = jnp.einsum(
        "tbh,tbg->hg",
        hs_prev.astype(jnp.float32),
        dxp.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return dxp, dw.astype(w_hh_t.dtype)


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


def lstm_fused(params, x, reverse=False, interpret=False):
    """Fused-kernel LSTM over (T, B, C); drop-in for layers.lstm.

    Differentiable end to end: dW_ih / biases / dx flow through the
    input-projection einsum; dW_hh and dx_proj come from the custom VJP.
    """
    x_proj = (
        jnp.einsum(
            "tbc,gc->tbg", x, params["w_ih"],
            preferred_element_type=jnp.float32,
        )
        + params["b_ih"]
        + params["b_hh"]
    )
    x_proj = x_proj.astype(x.dtype)
    if reverse:
        x_proj = jnp.flip(x_proj, axis=0)
    hs = _lstm_core(interpret, x_proj, params["w_hh"].T)
    if reverse:
        hs = jnp.flip(hs, axis=0)
    return hs


def lstm_pallas(params, x, b_tile=None, interpret=False):
    """Back-compat alias (tiling is now chosen automatically)."""
    del b_tile
    return lstm_fused(params, x, interpret=interpret)


def default_to_fused():
    """Use the fused kernels when running on real TPU hardware (the
    interpret path would only slow CPU runs); REMORA_TPU_LSTM=fused|scan
    overrides."""
    mode = os.environ.get("REMORA_TPU_LSTM", "auto")
    if mode == "fused":
        return True
    if mode == "scan":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
