"""Functional neural-net building blocks (pure JAX, pytree params).

Semantics match the torch modules the reference models are built from
(``nn.Conv1d`` / ``nn.BatchNorm1d`` / ``nn.LSTM`` / ``nn.Linear``) so
reference-trained weights import losslessly, but the implementation is
TPU-first:
  * convs lower to ``lax.conv_general_dilated`` (XLA tiles them onto the
    MXU; NCW layout end to end, no transposes between layers)
  * the LSTM input projection for ALL timesteps is one big matmul
    hoisted out of the scan — the sequential part is only h @ W_hh
  * parameters are plain nested dicts -> trivially jittable/pjittable

Initializers replicate torch defaults (kaiming-uniform fan-in bounds) so
training dynamics are comparable.
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def swish(x):
    return x * jax.nn.sigmoid(x)


# ---------------- Conv1d ----------------


def conv1d_init(rng, in_ch, out_ch, kernel, dtype=jnp.float32):
    wkey, bkey = jax.random.split(rng)
    fan_in = in_ch * kernel
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(
            wkey, (out_ch, in_ch, kernel), dtype, -bound, bound
        ),
        "b": jax.random.uniform(bkey, (out_ch,), dtype, -bound, bound),
    }


def conv1d(params, x, stride=1):
    """x: (B, T, C_in) -> (B, T', C_out).

    Channels-LAST end to end (round 5): activations live as (B, T, C)
    so channels sit in the lane dimension — the layout the TPU conv
    engine uses internally, the layout the LSTM kernel's (T, B, C)
    input needs (an outer-dims swap instead of a full relayout), and
    the layout the fused conv-BN backward kernels contract over.
    Parameters stay in the torch (O, I, K) format (checkpoint/export
    compatibility); the kernel transpose below is a no-cost weight-side
    reshape XLA folds into the conv.
    """
    out = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(params["w"], (2, 1, 0)),  # (O,I,K) -> (K,I,O)
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + params["b"]


# ---------------- BatchNorm1d ----------------


def batchnorm_init(num_feat, dtype=jnp.float32):
    params = {
        "gamma": jnp.ones((num_feat,), dtype),
        "beta": jnp.zeros((num_feat,), dtype),
    }
    state = {
        "mean": jnp.zeros((num_feat,), dtype),
        "var": jnp.ones((num_feat,), dtype),
    }
    return params, state


def batchnorm(params, state, x, train, momentum=0.1, eps=1e-5):
    """x: (B, T, C). Returns (out, new_state)."""
    if train:
        mean = jnp.mean(x, axis=(0, 1))
        var = jnp.var(x, axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["gamma"]
    out = (x - mean) * inv + params["beta"]
    return out, new_state


# ------------- fused Conv1d + BatchNorm1d(train) + swish -------------
#
# The conv->BN->swish block is the training step's top cost after the
# LSTM pair (reference structure: BN after every conv,
# ``models/ConvLSTM_w_ref.py:39–57``). Under plain autodiff XLA
# materialises the conv output AND the pre-swish activation as backward
# residuals and differentiates through mean/var literally, emitting four
# big reduction passes per block. This fused block:
#   * runs the conv WITHOUT bias — an additive bias cancels exactly in
#     (y - mean(y)), so it only shifts the running-mean update (added
#     back on the host-side state update) and its gradient is the sum of
#     the conv-output cotangent (computed in one fused reduction);
#   * saves only (x, mu, r) — backward recomputes the conv (FLOP-cheap
#     small-channel 1D convs) instead of storing (B, C, T) residuals;
#   * reduces ONLY dgamma/dbeta and reconstructs the conv-output
#     cotangent with the folded BN-backward identity
#       dy = gamma*r * (dz - dbeta/N - xhat * dgamma/N)
#     (mean(dxhat) = gamma*dbeta/N, mean(dxhat*xhat) = gamma*dgamma/N),
#     halving the backward reduction count.
# Numerics match the unfused path to fp-rounding (different association
# only); REMORA_TPU_CONVBN=plain|remat|fused overrides the default
# (fused on accelerators, plain on CPU).


def _conv_nobias(w, x, stride):
    """(B, T, C_in) -> (B, T', C_out); w in torch (O, I, K) format."""
    return jax.lax.conv_general_dilated(
        x,
        jnp.transpose(w, (2, 1, 0)),
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def _cbs_math(stride, eps, w, gamma, beta, x):
    y = _conv_nobias(w, x, stride)
    mu = jnp.mean(y, (0, 1))
    var = jnp.var(y, (0, 1))
    r = jax.lax.rsqrt(var + eps)
    xhat = (y - mu) * r
    z = gamma * xhat + beta
    out = z * jax.nn.sigmoid(z)
    return out, mu, var, r


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _cbs_core(stride, eps, w, b, gamma, beta, x):
    """Returns (out, mu, var) of swish(BN_train(conv(x, w))).

    ``b`` does not enter the output (it cancels in the normalization);
    it is an argument only so its gradient (sum of the conv-output
    cotangent) flows from the same VJP. ``mu``/``var`` are biasless
    batch stats for the running-state update — that path is
    non-differentiable (their cotangents are ignored), exactly like the
    aux-returned BN state in the unfused step.
    """
    del b
    out, mu, var, _r = _cbs_math(stride, eps, w, gamma, beta, x)
    return out, mu, var


def _cbs_fwd(stride, eps, w, b, gamma, beta, x):
    del b
    out, mu, var, r = _cbs_math(stride, eps, w, gamma, beta, x)
    return (out, mu, var), (w, gamma, beta, x, mu, r)


def _cbs_bwd(stride, eps, res, cts):
    dout = cts[0]  # mu/var feed the (non-differentiable) state update
    w, gamma, beta, x, mu, r = res
    y = _conv_nobias(w, x, stride)  # recompute: cheaper than residuals
    xhat = (y - mu) * r
    z = gamma * xhat + beta
    s = jax.nn.sigmoid(z)
    dz = dout * (s + z * s * (1.0 - s))
    dgamma = jnp.sum(dz * xhat, (0, 1))
    dbeta = jnp.sum(dz, (0, 1))
    n = y.shape[0] * y.shape[1]
    gr = gamma * r
    dy = gr * (dz - dbeta / n - xhat * (dgamma / n))
    # XLA distributes the three dy terms through the weight-grad conv
    # (three smaller convs per layer); measured FASTER than forcing a
    # materialized dy with an optimization_barrier (390k vs 384k) — let
    # the compiler keep that split.
    if os.environ.get("REMORA_TPU_CONVBN_BARRIER"):
        dy = jax.lax.optimization_barrier(dy.astype(x.dtype))
    db = jnp.sum(dy, (0, 1))
    _, conv_vjp = jax.vjp(
        lambda w_, x_: _conv_nobias(w_, x_, stride), w, x
    )
    dw, dx = conv_vjp(dy)
    return dw, db, dgamma, dbeta, dx


_cbs_core.defvjp(_cbs_fwd, _cbs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _cbs_core_resid(stride, eps, w, b, gamma, beta, x):
    """_cbs_core variant whose backward reads a saved ``xhat`` residual
    instead of recomputing the conv + normalization. Same math, one
    fewer pass over the big activation per layer in backward, at the
    cost of one residual write in forward (the better trade when the
    backward fusions dominate the step — select with
    REMORA_TPU_CONVBN=fused_resid)."""
    del b
    out, mu, var, _r = _cbs_math(stride, eps, w, gamma, beta, x)
    return out, mu, var


def _cbs_fwd_resid(stride, eps, w, b, gamma, beta, x):
    del b
    y = _conv_nobias(w, x, stride)
    mu = jnp.mean(y, (0, 1))
    var = jnp.var(y, (0, 1))
    r = jax.lax.rsqrt(var + eps)
    xhat = (y - mu) * r
    z = gamma * xhat + beta
    out = z * jax.nn.sigmoid(z)
    return (out, mu, var), (w, gamma, beta, x, xhat, r)


def _cbs_bwd_resid(stride, eps, res, cts):
    dout = cts[0]
    w, gamma, beta, x, xhat, r = res
    z = gamma * xhat + beta
    s = jax.nn.sigmoid(z)
    dz = dout * (s + z * s * (1.0 - s))
    dgamma = jnp.sum(dz * xhat, (0, 1))
    dbeta = jnp.sum(dz, (0, 1))
    n = xhat.shape[0] * xhat.shape[1]
    gr = gamma * r
    dy = gr * (dz - dbeta / n - xhat * (dgamma / n))
    if os.environ.get("REMORA_TPU_CONVBN_BARRIER"):
        dy = jax.lax.optimization_barrier(dy.astype(x.dtype))
    db = jnp.sum(dy, (0, 1))
    _, conv_vjp = jax.vjp(
        lambda w_, x_: _conv_nobias(w_, x_, stride), w, x
    )
    dw, dx = conv_vjp(dy)
    return dw, db, dgamma, dbeta, dx


_cbs_core_resid.defvjp(_cbs_fwd_resid, _cbs_bwd_resid)


# ---- packed-lanes backward variant ----
# The model's conv channels are tiny (4/16/64 of 128 VPU lanes), so the
# BN-backward elementwise/reduction chains XLA emits around the convs
# run at 1/32..1/2 lane occupancy in channels-last layout. This variant
# reshapes the (B*To, O) activations to (B*To/g, g*O == 128) — a free
# row-major bitcast — so swish', dz, the dgamma/dbeta reductions, and
# the folded-cotangent dy all run at FULL lane width, with the per-
# channel params tiled g times across lanes and the (g, O) lane sums
# folded at the end. dy is materialized once behind an
# optimization_barrier so XLA cannot split it across its three
# consumers and re-derive the BN math per consumer (the round-4
# measured pass-count problem, PERF.md). The dw/dx convs stay on the
# XLA conv custom calls (MXU). Stride-agnostic: the dz/dy math is
# per-output-position.


def _pack_factor(n_rows, O):
    """Lane-packing group size g with g*O == 128 (or 1 if O doesn't
    divide 128 or the row count doesn't split into g groups)."""
    if O <= 128 and 128 % O == 0 and n_rows % (128 // O) == 0:
        return 128 // O
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _cbs_core_packed(stride, eps, w, b, gamma, beta, x):
    del b
    out, mu, var, _r = _cbs_math(stride, eps, w, gamma, beta, x)
    return out, mu, var


def _cbs_fwd_packed(stride, eps, w, b, gamma, beta, x):
    del b
    y = _conv_nobias(w, x, stride)
    mu = jnp.mean(y, (0, 1))
    var = jnp.var(y, (0, 1))
    r = jax.lax.rsqrt(var + eps)
    xhat = (y - mu) * r
    z = gamma * xhat + beta
    out = z * jax.nn.sigmoid(z)
    return (out, mu, var), (w, gamma, beta, x, xhat, r)


def _cbs_bwd_packed(stride, eps, res, cts):
    dout = cts[0]
    w, gamma, beta, x, xhat, r = res
    B, To, O = dout.shape
    n = B * To
    g = _pack_factor(n, O)
    t = lambda v: jnp.tile(v.astype(jnp.float32), g)  # noqa: E731
    zz = xhat.reshape(n // g, g * O).astype(jnp.float32)
    dz = dout.reshape(n // g, g * O).astype(jnp.float32)
    z = t(gamma) * zz + t(beta)
    s = jax.nn.sigmoid(z)
    dz = dz * (s + z * s * (1.0 - s))
    dgamma = jnp.sum(dz * zz, 0).reshape(g, O).sum(0)
    dbeta = jnp.sum(dz, 0).reshape(g, O).sum(0)
    dy = (t(gamma) * t(r)) * (
        dz - t(dbeta) / n - zz * (t(dgamma) / n)
    )
    dy = jax.lax.optimization_barrier(dy.astype(x.dtype))
    db = jnp.sum(dy.astype(jnp.float32), 0).reshape(g, O).sum(0)
    dy = dy.reshape(B, To, O)
    _, conv_vjp = jax.vjp(
        lambda w_, x_: _conv_nobias(w_, x_, stride), w, x
    )
    dw, dx = conv_vjp(dy)
    return dw, db.astype(w.dtype), dgamma.astype(gamma.dtype), \
        dbeta.astype(beta.dtype), dx


_cbs_core_packed.defvjp(_cbs_fwd_packed, _cbs_bwd_packed)


# ---- Pallas fused-backward variant (stride-1 blocks) ----
# forward identical to _cbs_core; backward = one two-pass Pallas kernel
# (kernels/pallas_convbn.py) instead of the XLA fusion stew


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _cbs_core_pallas(stride, eps, w, b, gamma, beta, x):
    del b
    out, mu, var, _r = _cbs_math(stride, eps, w, gamma, beta, x)
    return out, mu, var


def _cbs_fwd_pallas(stride, eps, w, b, gamma, beta, x):
    del b
    out, mu, var, r = _cbs_math(stride, eps, w, gamma, beta, x)
    return (out, mu, var), (w, gamma, beta, x, mu, r)


def _cbs_bwd_pallas(stride, eps, res, cts):
    from remora_tpu.kernels.pallas_convbn import conv_bn_swish_bwd

    dout = cts[0]
    w, gamma, beta, x, mu, r = res
    dx, dw, db, dgamma, dbeta = conv_bn_swish_bwd(
        x, dout, w, gamma, beta, mu, r, stride=stride,
        interpret=jax.default_backend() != "tpu",
    )
    return (dw.astype(w.dtype), db.astype(w.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype), dx)


_cbs_core_pallas.defvjp(_cbs_fwd_pallas, _cbs_bwd_pallas)


def _convbn_impl():
    mode = os.environ.get("REMORA_TPU_CONVBN", "auto")
    if mode in ("plain", "remat", "fused", "fused_resid", "pallas",
                "packed"):
        return mode
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            plat = dd if isinstance(dd, str) else getattr(
                dd, "platform", None
            )
            if plat is not None:
                return "plain" if plat == "cpu" else "fused"
        return "plain" if jax.default_backend() == "cpu" else "fused"
    except Exception:
        return "plain"


def _cbs_plain(conv_params, bn_params, state, x, stride, momentum, eps):
    y = conv1d(conv_params, x, stride)
    y, ns = batchnorm(bn_params, state, y, True, momentum, eps)
    return swish(y), ns


def conv_bn_swish(conv_params, bn_params, state, x, stride=1, train=False,
                  momentum=0.1, eps=1e-5, impl=None):
    """swish(BatchNorm1d(Conv1d(x))) with running-state update.

    Drop-in for the conv->batchnorm->swish sequence both model families
    use after every conv. Returns (out, new_state).
    """
    if not train:
        y = conv1d(conv_params, x, stride)
        y, _ = batchnorm(bn_params, state, y, False, momentum, eps)
        return swish(y), state
    if impl is None:
        impl = _convbn_impl()
    if impl == "plain":
        return _cbs_plain(
            conv_params, bn_params, state, x, stride, momentum, eps
        )
    if impl == "remat":
        return jax.checkpoint(
            functools.partial(
                _cbs_plain, stride=stride, momentum=momentum, eps=eps
            )
        )(conv_params, bn_params, state, x)
    if impl == "pallas" and stride == 1:
        core = _cbs_core_pallas
    elif impl == "packed":
        core = _cbs_core_packed
    elif impl == "fused_resid":
        core = _cbs_core_resid
    else:
        core = _cbs_core
    out, mu, var = core(
        stride,
        eps,
        conv_params["w"],
        conv_params["b"],
        bn_params["gamma"],
        bn_params["beta"],
        x,
    )
    mu = jax.lax.stop_gradient(mu) + conv_params["b"]
    var = jax.lax.stop_gradient(var)
    y_cols = (x.shape[1] - conv_params["w"].shape[2]) // stride + 1
    n = x.shape[0] * y_cols
    unbiased = var * n / max(n - 1, 1)
    new_state = {
        "mean": (1 - momentum) * state["mean"] + momentum * mu,
        "var": (1 - momentum) * state["var"] + momentum * unbiased,
    }
    return out, new_state


# ---------------- LSTM ----------------


def lstm_init(rng, input_size, hidden_size, dtype=jnp.float32):
    keys = jax.random.split(rng, 4)
    bound = 1.0 / math.sqrt(hidden_size)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(keys[0], (4 * hidden_size, input_size)),
        "w_hh": u(keys[1], (4 * hidden_size, hidden_size)),
        "b_ih": u(keys[2], (4 * hidden_size,)),
        "b_hh": u(keys[3], (4 * hidden_size,)),
    }


def lstm_cell_step0(params, x):
    """One LSTM cell step from the zero state: h1 for input x (B, C).

    With h0 = c0 = 0 the recurrent and forget terms vanish:
    c1 = sigmoid(i) * tanh(g); h1 = sigmoid(o) * tanh(c1).
    """
    gates = (
        jnp.dot(x, params["w_ih"].T, preferred_element_type=jnp.float32)
        + params["b_ih"]
        + params["b_hh"]
    )
    i, _f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(i) * jnp.tanh(g)
    return jax.nn.sigmoid(o) * jnp.tanh(c)


def lstm(params, x, reverse=False, impl=None):
    """Single-layer LSTM over (T, B, C) input; returns hidden states (T, B, H).

    The x @ W_ih^T projection for the whole sequence runs as one batched
    matmul before the scan (MXU-friendly); the scan carries only the
    recurrent h @ W_hh^T.

    On real TPU hardware the recurrence runs as the fused Pallas kernel
    pair (kernels.pallas_lstm) — one program for the whole time loop,
    forward and backward — instead of a per-step ``lax.scan``.
    ``impl`` forces "fused" or "scan"; REMORA_TPU_LSTM=fused|scan is the
    env override.
    """
    if impl is None or impl == "auto":
        from remora_tpu.kernels.pallas_lstm import default_to_fused

        impl = "fused" if default_to_fused() else "scan"
    if impl == "fused":
        from remora_tpu.kernels.pallas_lstm import lstm_fused

        return lstm_fused(params, x, reverse=reverse)
    T, B, _C = x.shape
    H = params["w_hh"].shape[1]
    # precompute input contribution for all timesteps: (T, B, 4H)
    x_proj = (
        jnp.einsum(
            "tbc,gc->tbg", x, params["w_ih"],
            preferred_element_type=jnp.float32,
        )
        + params["b_ih"]
        + params["b_hh"]
    )
    if reverse:
        x_proj = jnp.flip(x_proj, axis=0)
    w_hh_t = params["w_hh"].T  # (H, 4H)

    def step(carry, xp):
        h, c = carry
        gates = xp + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((B, H), x_proj.dtype),
        jnp.zeros((B, H), x_proj.dtype),
    )
    _, hs = jax.lax.scan(step, init, x_proj)
    if reverse:
        hs = jnp.flip(hs, axis=0)
    return hs


def lstm_last(params, x, impl=None):
    """Final hidden state of a forward LSTM over (T, B, C): (B, H).

    Equivalent to ``lstm(params, x)[-1]`` but the fused inference
    kernel never materialises the (T, B, H) output in HBM. Used by the
    eval path (only the last timestep reaches the head).
    """
    if impl is None or impl == "auto":
        from remora_tpu.kernels.pallas_lstm import default_to_fused

        impl = "fused" if default_to_fused() else "scan"
    if impl == "fused":
        from remora_tpu.kernels.pallas_lstm import lstm_last_fused

        return lstm_last_fused(params, x)
    return lstm(params, x, impl="scan")[-1]


# ---------------- Linear ----------------


def linear_init(rng, in_feat, out_feat, dtype=jnp.float32):
    wkey, bkey = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_feat)
    return {
        "w": jax.random.uniform(wkey, (out_feat, in_feat), dtype, -bound, bound),
        "b": jax.random.uniform(bkey, (out_feat,), dtype, -bound, bound),
    }


def linear(params, x):
    return (
        jnp.dot(x, params["w"].T, preferred_element_type=jnp.float32)
        + params["b"]
    )


def param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
