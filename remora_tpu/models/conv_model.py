"""Conv-only dual-tower chunk classifier.

Reference analog: ``models/Conv_w_ref.py`` — signal + sequence towers,
four merge convs (two strided), flatten -> linear head sized for a
(50, 50) chunk context (final temporal width 3).
"""

import jax
import jax.numpy as jnp

from remora_tpu.models import layers as L

NAME = "Conv_w_ref"
_variable_width_possible = False


def init(rng, size=64, kmer_len=9, num_out=2, dtype=jnp.float32):
    keys = jax.random.split(rng, 16)
    params, bn_state = {}, {}

    def bn(name, feat):
        params[name], bn_state[name] = L.batchnorm_init(feat, dtype)

    params["sig_conv1"] = L.conv1d_init(keys[0], 1, 4, 11, dtype)
    bn("sig_bn1", 4)
    params["sig_conv2"] = L.conv1d_init(keys[1], 4, 16, 11, dtype)
    bn("sig_bn2", 16)
    params["sig_conv3"] = L.conv1d_init(keys[2], 16, size, 9, dtype)
    bn("sig_bn3", size)

    params["seq_conv1"] = L.conv1d_init(keys[3], kmer_len * 4, 16, 11, dtype)
    bn("seq_bn1", 16)
    params["seq_conv2"] = L.conv1d_init(keys[4], 16, 32, 11, dtype)
    bn("seq_bn2", 32)
    params["seq_conv3"] = L.conv1d_init(keys[5], 32, size, 9, dtype)
    bn("seq_bn3", size)

    params["merge_conv1"] = L.conv1d_init(keys[6], size * 2, size, 5, dtype)
    bn("merge_bn1", size)
    params["merge_conv2"] = L.conv1d_init(keys[7], size, size, 5, dtype)
    bn("merge_bn2", size)
    params["merge_conv3"] = L.conv1d_init(keys[8], size, size, 3, dtype)
    bn("merge_bn3", size)
    params["merge_conv4"] = L.conv1d_init(keys[9], size, size, 3, dtype)
    bn("merge_bn4", size)

    params["fc"] = L.linear_init(keys[10], size * 3, num_out, dtype)
    return params, bn_state


def forward(params, bn_state, sigs, seqs, train=False,
            channels_last_in=False):
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
    seqs_x = cbs("seq_conv2", "seq_bn2", seqs_x)
    seqs_x = cbs("seq_conv3", "seq_bn3", seqs_x, stride=3)

    z = jnp.concatenate((sigs_x, seqs_x), axis=2)
    z = cbs("merge_conv1", "merge_bn1", z)
    z = cbs("merge_conv2", "merge_bn2", z)
    z = cbs("merge_conv3", "merge_bn3", z, stride=2)
    z = cbs("merge_conv4", "merge_bn4", z, stride=2)

    # flatten channel-major (torch NCH semantics) so the fc weight
    # layout stays import/export-compatible
    z = jnp.swapaxes(z, 1, 2).reshape(z.shape[0], -1)
    return L.linear(params["fc"], z), ns
