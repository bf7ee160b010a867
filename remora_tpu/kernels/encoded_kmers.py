"""Encoded k-mer featurizer on device (JAX/XLA).

Device analog of remora_tpu.data.encoded_kmers (reference
``encoded_kmers.pyx``): builds the (B, 4*kmer_len, sig_len) one-hot
features entirely on device so the training/inference input pipeline
ships only the compact ragged arrays (int8 seqs + int16 maps) over PCIe
instead of the ~50x larger float features.

Formulation: scatter-add + cumsum produces the sequence-position-of-
signal index map, then a gather + one-hot per k-mer slot (vectorized
over slots); everything fuses into a handful of XLA ops.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("sig_len",))
def seq_pos_of_sig(seq_mappings, seq_lens, sig_len):
    """(B, sig_len) int32: index of the base covering each signal pos."""
    B, Sp1 = seq_mappings.shape
    s_idx = jnp.arange(1, Sp1)[None, :]
    valid = s_idx < seq_lens[:, None]
    cols = jnp.where(
        valid, jnp.clip(seq_mappings[:, 1:], 0, sig_len), sig_len
    )
    bumps = jnp.zeros((B, sig_len + 1), jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], cols.shape)
    bumps = bumps.at[rows, cols].add(1, mode="drop")
    return jnp.cumsum(bumps[:, :sig_len], axis=1)


@partial(
    jax.jit,
    static_argnames=("before_bases", "after_bases", "sig_len"),
)
def compute_encoded_kmer_batch(before_bases, after_bases, seqs, seq_mappings,
                               seq_lens, sig_len):
    """One-hot k-mer features; equivalent to the host featurizer.

    Args:
        seqs: (B, S + stored_context) int8
        seq_mappings: (B, S+1) int (chunk-relative)
        seq_lens: (B,) int
        sig_len: static chunk width

    Returns (B, 4*kmer_len, sig_len) float32.
    """
    kmer_len = before_bases + after_bases + 1
    B = seqs.shape[0]
    pos = seq_pos_of_sig(
        seq_mappings.astype(jnp.int32), seq_lens.astype(jnp.int32), sig_len
    )
    # gather bases for all kmer slots: (B, K, W)
    slot_idx = pos[:, None, :] + jnp.arange(kmer_len)[None, :, None]
    slot_idx = jnp.clip(slot_idx, 0, seqs.shape[1] - 1)
    bases = jnp.take_along_axis(
        seqs.astype(jnp.int32)[:, None, :].repeat(kmer_len, axis=1),
        slot_idx,
        axis=2,
    )
    # one-hot over 4 channels; -1 bases produce all-zero rows
    onehot = jax.nn.one_hot(bases, 4, dtype=jnp.float32, axis=-1)
    # (B, K, W, 4) -> (B, K, 4, W) -> (B, 4K, W)
    out = jnp.transpose(onehot, (0, 1, 3, 2)).reshape(
        B, 4 * kmer_len, sig_len
    )
    return out
