"""Fused LSTM scan — forward AND backward — as Pallas TPU kernels.

The ConvLSTM's sequential hot op (reference ``models/ConvLSTM_w_ref.py``
uses ``nn.LSTM``; here the input projection x @ W_ih^T for all T steps
is one big MXU matmul outside, so the recurrence carries only
h @ W_hh^T). An XLA ``lax.scan`` re-launches the fused loop body and
round-trips h/c through HBM every step, costing a fixed ~30us per step
on a v5e — ~8ms of a 2048-chunk training step. These kernels instead run
the whole time loop inside ONE program each:

  * grid (batch_tiles, T) with time as the inner (sequential) axis —
    Pallas auto-pipelines the per-step x_proj/h/c block DMAs against
    compute (double-buffered by the grid pipeline);
  * h and c persist in VMEM scratch across the time steps of a batch
    tile; the recurrent (BT, H) @ (H, 4H) matmul rides the MXU in the
    compute dtype (bf16 operands under mixed precision, f32 accum);
  * the backward kernel walks the grid's time axis in reverse (block
    index maps T-1-t), recomputes the gate pre-activations from the
    saved h/c states (cheaper than materialising (T, B, 4H) gate
    activations in HBM), and carries dh/dc in VMEM scratch;
  * dW_hh and the bias/input-projection gradients fall out of dx_proj
    via two large one-shot matmuls outside the kernels.

``lstm_fused`` is a drop-in for ``models.layers.lstm`` wired up with
``jax.custom_vjp``; gradient parity vs the XLA scan is covered in
tests/test_refine_etl.py (interpret mode).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_batch_tile(B):
    """Largest tile <= 1024 dividing B keeps both kernels' working sets
    well inside VMEM (backward streams 5 inputs + 1 output per step)."""
    for bt in (1024, 512, 256, 128):
        if B % bt == 0:
            return bt
    return B


def _gates(xp, h, c_prev, w_ref, H):
    """Shared gate math: pre-activations -> (i, f, g, o, c, tanh_c)."""
    z = xp + jnp.dot(
        h.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32
    )
    i = jax.nn.sigmoid(z[:, :H])
    f = jax.nn.sigmoid(z[:, H : 2 * H])
    g = jnp.tanh(z[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(z[:, 3 * H :])
    c = f * c_prev + i * g
    return i, f, g, o, c


def _fwd_kernel(xp_ref, w_ref, hs_ref, cs_ref, h_sc, c_sc, *, H):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_sc[:] = jnp.zeros_like(h_sc)
        c_sc[:] = jnp.zeros_like(c_sc)

    xp = xp_ref[0].astype(jnp.float32)
    i, f, g, o, c = _gates(xp, h_sc[:], c_sc[:], w_ref, H)
    h = o * jnp.tanh(c)
    h_sc[:] = h
    c_sc[:] = c
    hs_ref[0] = h
    cs_ref[0] = c


def _bwd_kernel(xp_ref, hp_ref, ct_ref, cp_ref, dh_ref, w_ref, wt_ref,
                dxp_ref, dh_sc, dc_sc, *, H, T):
    g_idx = pl.program_id(1)
    at_t0 = g_idx == T - 1  # time index T-1-g_idx == 0

    @pl.when(g_idx == 0)
    def _init():
        dh_sc[:] = jnp.zeros_like(dh_sc)
        dc_sc[:] = jnp.zeros_like(dc_sc)

    zero = jnp.zeros_like(dh_sc)
    h_prev = jnp.where(at_t0, zero, hp_ref[0])
    c_prev = jnp.where(at_t0, zero, cp_ref[0])

    xp = xp_ref[0].astype(jnp.float32)
    i, f, g, o, _c = _gates(xp, h_prev, c_prev, w_ref, H)
    tanh_c = jnp.tanh(ct_ref[0])

    dh = dh_ref[0] + dh_sc[:]
    do = dh * tanh_c
    dc = dc_sc[:] + dh * o * (1.0 - tanh_c * tanh_c)
    dgi = dc * g * i * (1.0 - i)
    dgf = dc * c_prev * f * (1.0 - f)
    dgg = dc * i * (1.0 - g * g)
    dgo = do * o * (1.0 - o)
    dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=1)

    dxp_ref[0] = dgates.astype(dxp_ref.dtype)
    dh_sc[:] = jnp.dot(
        dgates.astype(wt_ref.dtype),
        wt_ref[:],
        preferred_element_type=jnp.float32,
    )
    dc_sc[:] = dc * f


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(x_proj, w_hh_t, interpret=False):
    T, B, H4 = x_proj.shape
    H = H4 // 4
    BT = _pick_batch_tile(B)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H),
        grid=(B // BT, T),
        in_specs=[
            pl.BlockSpec((1, BT, H4), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, BT, H), lambda b, t: (t, b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_proj, w_hh_t)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(x_proj, w_hh_t, hs, cs, dhs, interpret=False):
    T, B, H4 = x_proj.shape
    H = H4 // 4
    BT = _pick_batch_tile(B)
    rev = lambda b, t: (T - 1 - t, b, 0)  # noqa: E731
    rev_prev = lambda b, t: (jnp.maximum(T - 2 - t, 0), b, 0)  # noqa: E731
    dxp = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, T=T),
        grid=(B // BT, T),
        in_specs=[
            pl.BlockSpec((1, BT, H4), rev),
            pl.BlockSpec((1, BT, H), rev_prev),
            pl.BlockSpec((1, BT, H), rev),
            pl.BlockSpec((1, BT, H), rev_prev),
            pl.BlockSpec((1, BT, H), rev),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0)),
            pl.BlockSpec((H4, H), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BT, H4), rev),
        out_shape=jax.ShapeDtypeStruct((T, B, H4), x_proj.dtype),
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_proj, hs, cs, cs, dhs, w_hh_t, w_hh_t.T)
    return dxp


# positional layout: (interpret, x_proj, w_hh_t) so the static flag can
# be a nondiff argnum
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lstm_core(interpret, x_proj, w_hh_t):
    hs, _ = _fwd_call(x_proj, w_hh_t, interpret=interpret)
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
        hs_prev,
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
    """Back-compat alias (b_tile is now chosen automatically)."""
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
