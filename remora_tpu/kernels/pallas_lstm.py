"""Fused LSTM scan as a Pallas TPU kernel.

The model's sequential hot op: h_t = LSTMCell(x_proj_t, h_{t-1}, c_{t-1})
with the input projection precomputed (one big MXU matmul outside). The
XLA scan round-trips h/c through HBM every step and re-launches the
fused region; this kernel keeps W_hh, h and c resident in VMEM for the
whole sequence and double-buffers the per-step x_proj tiles from HBM
(pallas_guide.md double-buffering pattern), with the recurrent
(B_TILE, H) @ (H, 4H) matmul on the MXU.

Grid: one program per batch tile; each runs all T steps.
Layout: x_proj (T, B, 4H) f32 in HBM; out hs (T, B, H) f32.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_B_TILE = 256


def _lstm_kernel(x_hbm, w_ref, out_hbm, h_ref, c_ref, xbuf, obuf,
                 in_sems, out_sems, *, T, B_TILE, H, HP):
    """One batch tile, all timesteps, double-buffered x DMA.

    HP is the lane-aligned (>=128) padded hidden width used for the
    output staging buffer and HBM output array; the caller slices the
    first H columns.
    """
    bidx = pl.program_id(0)
    b_start = bidx * B_TILE

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(b_start, B_TILE), :],
            xbuf.at[slot],
            in_sems.at[slot],
        )

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            obuf.at[slot],
            out_hbm.at[t, pl.ds(b_start, B_TILE), :],
            out_sems.at[slot],
        )

    h_ref[:] = jnp.zeros((B_TILE, H), jnp.float32)
    c_ref[:] = jnp.zeros((B_TILE, H), jnp.float32)
    in_dma(0, 0).start()

    def step(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < T)
        def _():
            in_dma(nxt, t + 1).start()

        in_dma(slot, t).wait()
        gates = xbuf[slot] + jnp.dot(
            h_ref[:], w_ref[:], preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(gates[:, 0:H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
        c = f * c_ref[:] + i * g
        h = o * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h

        # wait for the previous output DMA on this slot before reuse
        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()

        if HP == H:
            obuf[slot] = h
        else:
            obuf[slot] = jnp.concatenate(
                [h, jnp.zeros((B_TILE, HP - H), jnp.float32)], axis=1
            )
        out_dma(slot, t).start()
        return _

    jax.lax.fori_loop(0, T, step, None)
    # drain trailing output DMAs
    @pl.when(T >= 2)
    def _():
        out_dma(T % 2, T - 2).wait()

    out_dma((T - 1) % 2, T - 1).wait()


@functools.partial(jax.jit, static_argnames=("b_tile", "interpret"))
def lstm_pallas_xproj(x_proj, w_hh_t, b_tile=DEFAULT_B_TILE,
                      interpret=False):
    """Run the fused LSTM over a precomputed input projection.

    Args:
        x_proj: (T, B, 4H) float32 — x @ W_ih^T + b_ih + b_hh
        w_hh_t: (H, 4H) float32 — transposed recurrent weights
    Returns:
        hs: (T, B, H) float32 hidden states
    """
    T, B, H4 = x_proj.shape
    H = H4 // 4
    HP = max(H, 128)  # lane-aligned staging width for DMA'd slices
    # grid programs execute sequentially on a TPU core, so batch tiling
    # would serialize the batch; run the whole batch per step as long as
    # the double buffers fit VMEM (~16MB)
    step_bytes = 4 * (2 * B * H4 + 2 * B * HP + 2 * B * H) + 4 * H * H4
    if step_bytes <= 12 * 1024 * 1024:
        b_tile = B
    else:
        b_tile = min(b_tile, B)
    assert B % b_tile == 0, f"batch {B} not divisible by tile {b_tile}"
    grid = (B // b_tile,)
    kernel = functools.partial(
        _lstm_kernel, T=T, B_TILE=b_tile, H=H, HP=HP
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x_proj stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((T, B, HP), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),      # h
            pltpu.VMEM((b_tile, H), jnp.float32),      # c
            pltpu.VMEM((2, b_tile, 4 * H), jnp.float32),  # x double buffer
            pltpu.VMEM((2, b_tile, HP), jnp.float32),  # out double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x_proj, w_hh_t)
    return out[:, :, :H] if HP != H else out


def lstm_pallas(params, x, b_tile=DEFAULT_B_TILE, interpret=False):
    """Drop-in replacement for layers.lstm forward direction.

    x: (T, B, C); returns (T, B, H).
    """
    x_proj = (
        jnp.einsum(
            "tbc,gc->tbg", x, params["w_ih"],
            preferred_element_type=jnp.float32,
        )
        + params["b_ih"]
        + params["b_hh"]
    )
    return lstm_pallas_xproj(
        x_proj, params["w_hh"].T, b_tile=b_tile, interpret=interpret
    )
