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

import math

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
    """x: (B, C_in, T) -> (B, C_out, T')."""
    out = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + params["b"][None, :, None]


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
    """x: (B, C, T). Returns (out, new_state)."""
    if train:
        mean = jnp.mean(x, axis=(0, 2))
        var = jnp.var(x, axis=(0, 2))
        n = x.shape[0] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["gamma"]
    out = (x - mean[None, :, None]) * inv[None, :, None] + params["beta"][
        None, :, None
    ]
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
