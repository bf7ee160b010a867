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
    static_argnames=(
        "before_bases", "after_bases", "sig_len", "out_dtype",
        "channels_last",
    ),
)
def compute_encoded_kmer_batch(before_bases, after_bases, seqs, seq_mappings,
                               seq_lens, sig_len, out_dtype=None,
                               channels_last=False):
    """One-hot k-mer features; equivalent to the host featurizer.

    Args:
        seqs: (B, S + stored_context) int8
        seq_mappings: (B, S+1) int (chunk-relative)
        seq_lens: (B,) int
        sig_len: static chunk width
        out_dtype: output dtype (default float32). Every value is
            exactly 0.0 or 1.0, so bfloat16 output is lossless and
            halves the HBM round-trip into the consuming conv.
        channels_last: emit (B, sig_len, 4*kmer_len) instead — the
            layout the channels-last towers consume — by reordering the
            einsum output, which costs nothing (same contraction).

    Returns (B, 4*kmer_len, sig_len) in ``out_dtype`` (or the
    channels-last orientation).
    """
    kmer_len = before_bases + after_bases + 1
    B = seqs.shape[0]
    S = seq_mappings.shape[1] - 1

    # TPU formulation: the featurization is a batched 0/1 matmul
    #   out[b, 4k+c, t] = sum_s slot_oh[b, 4k+c, s] * A[b, s, t]
    # where slot_oh comes from STATIC shifts of the one-hot sequence
    # (no per-element gather — TPU gathers serialize) and A assigns each
    # signal position to its covering base via two compares. Each
    # (slot, t) hits at most one s, so outputs are exactly 0.0/1.0 —
    # bit-identical to the gather/one-hot construction — and the
    # contraction runs on the MXU instead of the gather slow path.
    seq_oh = jax.nn.one_hot(seqs, 4, dtype=jnp.float32, axis=1)  # (B,4,S+ctx)
    pad = max(0, S + kmer_len - 1 - seqs.shape[1])
    if pad > 0:
        seq_oh = jnp.pad(seq_oh, ((0, 0), (0, 0), (0, pad)))
    slot_oh = jnp.concatenate(
        [seq_oh[:, :, k : k + S] for k in range(kmer_len)], axis=1
    )  # (B, 4K, S)

    m = seq_mappings.astype(jnp.int32)
    s_row = jnp.arange(S + 1)[None, :]
    # rows past the true sequence cover nothing: pin their bounds at W.
    # base 0's coverage starts at 0 (the cumsum formulation ignores
    # map[0]); maps are monotonic by chunk invariant
    m = jnp.where(s_row < seq_lens[:, None], jnp.clip(m, 0, sig_len), sig_len)
    m = m.at[:, 0].set(0)
    t_row = jnp.arange(sig_len)[None, None, :]
    # bf16 operands are exact for 0/1 values and halve MXU input traffic;
    # CPU backends emulate bf16 matmuls slowly, so keep f32 there
    mm_dtype = (
        jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    )
    assign = (
        (m[:, :-1, None] <= t_row) & (t_row < m[:, 1:, None])
    ).astype(mm_dtype)  # (B, S, W) exact 0/1

    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    spec = "bks,bst->btk" if channels_last else "bks,bst->bkt"
    out = jnp.einsum(
        spec,
        slot_oh.astype(mm_dtype),
        assign,
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
    shape = (
        (B, sig_len, 4 * kmer_len)
        if channels_last
        else (B, 4 * kmer_len, sig_len)
    )
    return out.reshape(shape)
