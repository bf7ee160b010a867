"""Fused stride-1 conv+BN(train)+swish BACKWARD as one Pallas kernel.

The train step's top cost bucket is the XLA fusion stew around the
conv->BatchNorm->swish blocks (reference structure
``models/ConvLSTM_w_ref.py:39–57``): under autodiff XLA re-derives the
BN-backward arithmetic once per consumer and pays ~8–12 passes over the
big activations per block (PERF.md round 4). This kernel computes the
ENTIRE block backward — swish', the dgamma/dbeta batch reductions, the
folded BN-backward cotangent, the weight gradient, the bias gradient
and the input cotangent — in exactly two passes over the activations,
with the convolutions done in-kernel as K accumulated MXU matmuls.

Layout: channels-last flattened rows. Activations arrive as
(B*T, C) — batch-and-time in sublanes, channels in lanes — which makes
a k-tap conv a sublane roll + (rows, I) @ (I, O) matmul, the BN
reductions a plain rows-axis sum, and the weight gradient a
rows-contraction matmul. ``dout`` is zero-padded from T_out to T_in
rows per batch element BEFORE the call so x/dout rows align; the
zero pad rows also guarantee rolled reads never contaminate a
neighbouring batch element (every cross-element row the roll can pull
is a zero row of dy).

Grid (2, B/Bt): phase 0 accumulates dgamma/dbeta over all tiles (the
batch-stat reduction barrier), phase 1 recomputes the tile's dz
(FLOP-cheap vs. storing it), forms dy, and produces dx / dw / db.
Parity vs the XLA custom-VJP path is fp-rounding only (same math,
different association); covered in tests/test_kernels.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_rows(x, k):
    """x shifted k rows up: out[r] = x[r + k] (circular; callers ensure
    wrapped rows only ever meet zero-padded dy rows). Only ever applied
    to f32 arrays — Mosaic's rotate is unimplemented for 16-bit data,
    so the kernels roll matmul RESULTS (f32) rather than bf16 operands:
    roll(x) @ W == roll(x @ W) row-for-row."""
    if k == 0:
        return x
    return pltpu.roll(x, x.shape[0] - k, 0)


def _roll_rows_down(x, k):
    """out[r] = x[r - k] (circular)."""
    if k == 0:
        return x
    return pltpu.roll(x, k, 0)


def _bwd_kernel(x_ref, g_ref, w_ref, wt_ref, sv_ref, dx_ref, dw_ref,
                db_ref, dgb_ref, acc_ref, *, K, Ti, To, n_total, NB):
    """One (phase, tile) grid step.

    x_ref (R, I) bf16/f32, g_ref (R, O) = padded dout, w_ref (K*I, O),
    wt_ref (K*O, I) the per-tap transposed weights, sv_ref (8, O) f32
    rows 0..3 = gamma, beta, mu, r. Outputs: dx (R, I), dw (K*I, O)
    f32, db (1, O) f32, dgb (2, O) f32. acc_ref (8, O) f32 scratch rows
    0/1 = running dgamma/dbeta, 2 = running db.
    """
    phase = pl.program_id(0)
    tile = pl.program_id(1)

    @pl.when((phase == 0) & (tile == 0))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    g = g_ref[:]
    gamma = sv_ref[0, :][None, :]
    beta = sv_ref[1, :][None, :]
    mu = sv_ref[2, :][None, :]
    r = sv_ref[3, :][None, :]

    # recompute the raw conv output for this tile: K matmuls, each
    # result rolled k rows up (f32 accumulation; bf16 operands are
    # single exact MXU passes; rolling results keeps rotates 32-bit)
    y = None
    for k in range(K):
        part = _roll_rows(
            jnp.dot(
                x, w_ref[k * x.shape[1] : (k + 1) * x.shape[1], :],
                preferred_element_type=jnp.float32,
            ),
            k,
        )
        y = part if y is None else y + part
    xhat = (y - mu) * r
    z = gamma * xhat + beta
    s = jax.nn.sigmoid(z)
    dz = g.astype(jnp.float32) * (s + z * s * (1.0 - s))
    # padded dout rows are zero => dz is zero there; no masking needed
    # for the stat sums

    @pl.when(phase == 0)
    def _stats():
        acc_ref[0, :] += jnp.sum(dz * xhat, 0)
        acc_ref[1, :] += jnp.sum(dz, 0)

    @pl.when(phase == 1)
    def _grads():
        dgamma = acc_ref[0, :][None, :]
        dbeta = acc_ref[1, :][None, :]
        gr = gamma * r
        dy = gr * (dz - dbeta / n_total - xhat * (dgamma / n_total))
        # rows t >= To of each batch element carry a nonzero -dbeta/n
        # term from the broadcast: zero them so dw/dx/db stay exact
        rows_t = jax.lax.broadcasted_iota(
            jnp.int32, dy.shape, 0
        ) % Ti
        dy = jnp.where(rows_t < To, dy, 0.0)
        acc_ref[2, :] += jnp.sum(dy, 0)
        # dw[k] += x_rolled(k)^T @ dy == x^T @ dy_rolled_down(k):
        # roll the f32 dy (32-bit rotate), cast per tap for the MXU
        dx = None
        for k in range(K):
            dyk = _roll_rows_down(dy, k).astype(x.dtype)
            dw_ref[k * x.shape[1] : (k + 1) * x.shape[1], :] += (
                jax.lax.dot_general(
                    x, dyk, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            # dx[r] = sum_k dy[r - k] @ W_k^T (shares the rolled dy)
            part = jnp.dot(
                dyk, wt_ref[k * dy.shape[1] : (k + 1) * dy.shape[1], :],
                preferred_element_type=jnp.float32,
            )
            dx = part if dx is None else dx + part
        dx_ref[:] = dx.astype(dx_ref.dtype)

        @pl.when(tile == NB - 1)
        def _emit_scalars():
            dgb_ref[0, :] = acc_ref[0, :]
            dgb_ref[1, :] = acc_ref[1, :]
            db_ref[0, :] = acc_ref[2, :]

    @pl.when((phase == 0) & (tile == NB - 1))
    def _zero_dw():
        dw_ref[:] = jnp.zeros_like(dw_ref)


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def conv_bn_swish_bwd(x, dout, w, gamma, beta, mu, r, stride=1,
                      interpret=False):
    """Fused backward of swish(BN_train(conv1d(x, w))) for stride 1.

    Args:
        x: (B, Ti, I) input activations (channels-last)
        dout: (B, To, O) output cotangent
        w: (O, I, K) torch-format conv weight
        gamma, beta, mu, r: (O,) BN scale/shift and saved batch
            mean / rsqrt(var + eps)
    Returns (dx (B, Ti, I), dw (O, I, K) f32, db, dgamma, dbeta).
    """
    assert stride == 1
    B, Ti, I = x.shape
    _B, To, O = dout.shape
    K = w.shape[2]
    assert To == Ti - K + 1 and w.shape[:2] == (O, I)

    # per-tap operand stacks: w_stack[(k, i), o] = w[o, i, k] and
    # wt_stack[(k, o), i] = w[o, i, k]
    w_kio = jnp.transpose(w, (2, 1, 0))  # (K, I, O)
    w_stack = w_kio.reshape(K * I, O).astype(x.dtype)
    wt_stack = jnp.transpose(w, (2, 0, 1)).reshape(K * O, I).astype(x.dtype)
    sv = jnp.stack(
        [gamma, beta, mu, r]
        + [jnp.zeros_like(gamma)] * 4
    ).astype(jnp.float32)  # (8, O)

    g_pad = jnp.pad(dout, ((0, 0), (0, Ti - To), (0, 0)))
    x2 = x.reshape(B * Ti, I)
    g2 = g_pad.reshape(B * Ti, O)

    # batch tile: bound the (rows, lanes) working set; rows per tile
    # must divide B*Ti at a whole-element boundary
    target_rows = 4096
    bt = max(1, min(B, target_rows // max(Ti, 1)))
    while B % bt:
        bt -= 1
    R = bt * Ti
    NB = B // bt
    n_total = np.float32(B * To)

    dx2, dw_stack, db, dgb = pl.pallas_call(
        functools.partial(
            _bwd_kernel, K=K, Ti=Ti, To=To, n_total=n_total, NB=NB
        ),
        grid=(2, NB),
        in_specs=[
            pl.BlockSpec((R, I), lambda p, b: (b, 0)),
            pl.BlockSpec((R, O), lambda p, b: (b, 0)),
            pl.BlockSpec((K * I, O), lambda p, b: (0, 0)),
            pl.BlockSpec((K * O, I), lambda p, b: (0, 0)),
            pl.BlockSpec((8, O), lambda p, b: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((R, I), lambda p, b: (b, 0)),
            pl.BlockSpec((K * I, O), lambda p, b: (0, 0)),
            pl.BlockSpec((1, O), lambda p, b: (0, 0)),
            pl.BlockSpec((2, O), lambda p, b: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * Ti, I), x.dtype),
            jax.ShapeDtypeStruct((K * I, O), jnp.float32),
            jax.ShapeDtypeStruct((1, O), jnp.float32),
            jax.ShapeDtypeStruct((2, O), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, O), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, g2, w_stack, wt_stack, sv)

    dx = dx2.reshape(B, Ti, I)
    dw = jnp.transpose(dw_stack.reshape(K, I, O), (2, 1, 0))  # (O, I, K)
    return dx, dw, db[0], dgb[0], dgb[1]
