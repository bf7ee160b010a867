"""ConvLSTM dual-tower chunk classifier (default architecture).

Reference analog: ``models/ConvLSTM_w_ref.py`` — signal tower (3 convs),
sequence tower (2 convs), merge conv, forward LSTM, reverse LSTM, final
timestep -> linear head. BatchNorm + swish after every conv.
"""

import jax
import jax.numpy as jnp

from remora_tpu.models import layers as L

NAME = "ConvLSTM_w_ref"
_variable_width_possible = False


def init(rng, size=64, kmer_len=9, num_out=2, dtype=jnp.float32):
    keys = jax.random.split(rng, 16)
    params, bn_state = {}, {}

    def bn(name, feat):
        params[name], bn_state[name] = L.batchnorm_init(feat, dtype)

    params["sig_conv1"] = L.conv1d_init(keys[0], 1, 4, 5, dtype)
    bn("sig_bn1", 4)
    params["sig_conv2"] = L.conv1d_init(keys[1], 4, 16, 5, dtype)
    bn("sig_bn2", 16)
    params["sig_conv3"] = L.conv1d_init(keys[2], 16, size, 9, dtype)
    bn("sig_bn3", size)

    params["seq_conv1"] = L.conv1d_init(keys[3], kmer_len * 4, 16, 5, dtype)
    bn("seq_bn1", 16)
    params["seq_conv2"] = L.conv1d_init(keys[4], 16, size, 13, dtype)
    bn("seq_bn2", size)

    params["merge_conv1"] = L.conv1d_init(keys[5], size * 2, size, 5, dtype)
    bn("merge_bn", size)
    params["lstm1"] = L.lstm_init(keys[6], size, size, dtype)
    params["lstm2"] = L.lstm_init(keys[7], size, size, dtype)
    params["fc"] = L.linear_init(keys[8], size, num_out, dtype)
    return params, bn_state


def forward(params, bn_state, sigs, seqs, train=False,
            channels_last_in=False):
    """sigs: (B, 1, T); seqs: (B, 4*kmer_len, T) -> logits (B, num_out).

    Returns (logits, new_bn_state).

    The towers compute in channels-LAST (B, T, C) layout (see
    layers.conv1d); ``channels_last_in=True`` says the inputs already
    arrive as sigs (B, T, 1) / seqs (B, T, 4*kmer_len) — the on-device
    featurizer emits that for free, sparing the hot paths the entry
    transpose the legacy (B, C, T) contract pays here.
    """
    ns = {}

    if not channels_last_in:
        sigs = jnp.swapaxes(sigs, 1, 2)
        seqs = jnp.swapaxes(seqs, 1, 2)

    def cbs(conv_name, bn_name, x, stride=1):
        x, ns[bn_name] = L.conv_bn_swish(
            params[conv_name], params[bn_name], bn_state[bn_name], x,
            stride=stride, train=train,
        )
        return x

    sigs_x = cbs("sig_conv1", "sig_bn1", sigs)
    sigs_x = cbs("sig_conv2", "sig_bn2", sigs_x)
    sigs_x = cbs("sig_conv3", "sig_bn3", sigs_x, stride=3)

    seqs_x = cbs("seq_conv1", "seq_bn1", seqs)
    seqs_x = cbs("seq_conv2", "seq_bn2", seqs_x, stride=3)

    z = jnp.concatenate((sigs_x, seqs_x), axis=2)
    z = cbs("merge_conv1", "merge_bn", z)

    z = jnp.swapaxes(z, 0, 1)  # (B, T, C) -> (T, B, C): outer-dim swap
    # The reference takes flip(swish(lstm2(swish(lstm1(z))))[-1], i.e.
    # only the FIRST step of the reverse LSTM on the final forward
    # timestep ever reaches the head — so the whole reverse scan
    # collapses to a single zero-state cell step, and the elementwise
    # swish between the layers only needs the final timestep
    # (swish(h)[-1] == swish(h[-1]); both verified bit-identical to the
    # full form, saving two (T, B, H) passes per train step).
    if train:
        z = L.swish(L.lstm(params["lstm1"], z)[-1])
    else:
        # inference: the fused last-only kernel skips the (T, B, H)
        # hidden-state write entirely (no backward residuals needed)
        z = L.swish(L.lstm_last(params["lstm1"], z))
    z = L.swish(L.lstm_cell_step0(params["lstm2"], z))
    return L.linear(params["fc"], z), ns
