"""Quantified numeric-drift contracts on the bundled real reads.

Two documented-but-previously-unmeasured drifts (VERDICT round 3):

1. ``--bf16`` inference: how many ML tag bytes change vs the f32
   reference path. Users need the number to judge when the ~1.8x
   device-stage speedup is safe.
2. ``SigMapRefiner.refine_reads_batch`` at ``scale_iters > 1``: the
   batched device path normalizes ``(dacs - shift) / scale`` on device
   in f32, so DP ties can flip on <=1-ulp signal differences vs the
   host path (``refine/refiner.py`` docstring; reference anchor
   ``src/remora/refine_signal_map.py:471–495``).

Both tests PRINT the measured drift (captured in the test log) and pin
an upper bound so a regression that blows the drift up fails loudly.
"""

import numpy as np
import pytest

DATA = "/root/reference/tests/data"


def _ml_bytes(logits):
    """ML tag bytes exactly as the formatter computes them
    (core/tags.py: floor(p * 256), capped at 255)."""
    from remora_tpu.core.tags import softmax

    probs = softmax(logits)[:, 1:].astype(np.float64)
    return np.minimum(np.floor(probs * 256), 255).astype(np.uint8)


def test_bf16_ml_byte_drift(trained_model, can_chunks):
    """Fraction of ML bytes that differ between f32 and bf16 inference
    over the bundled 205-chunk canonical dataset."""
    import jax.numpy as jnp

    from remora_tpu.data.dataset import CoreDataset
    from remora_tpu.infer.infer import ModelHandle

    h32 = ModelHandle.load(trained_model)
    h16 = ModelHandle.load(trained_model, compute_dtype=jnp.bfloat16)
    cc = h32.metadata["chunk_context"]
    ds = CoreDataset(
        str(can_chunks),
        override_metadata={
            "chunk_context": tuple(cc),
            "kmer_context_bases": tuple(
                h32.metadata["kmer_context_bases"]
            ),
            "extra_arrays": {},
        },
        infinite_iter=False,
        do_check_super_batches=True,
    )
    n_total = n_diff = 0
    max_byte_delta = 0
    for batch in ds.iter_batches():
        ml32 = _ml_bytes(
            np.asarray(h32.eval_fn(batch["signal"], batch["enc_kmers"]))
        )
        ml16 = _ml_bytes(
            np.asarray(h16.eval_fn(batch["signal"], batch["enc_kmers"]))
        )
        n_total += ml32.size
        n_diff += int((ml32 != ml16).sum())
        if ml32.size:
            max_byte_delta = max(
                max_byte_delta,
                int(
                    np.abs(
                        ml32.astype(np.int16) - ml16.astype(np.int16)
                    ).max()
                ),
            )
    assert n_total >= 200
    frac = n_diff / n_total
    print(
        f"\nbf16 ML drift: {n_diff}/{n_total} bytes differ "
        f"({frac:.2%}), max |delta| = {max_byte_delta}"
    )
    # bf16 has ~3 decimal digits; probabilities land within ~1% of f32,
    # so ML bytes (p*256) shift by a few counts on a minority of calls.
    # A blow-up past half the calls or past 16/256 counts means the
    # bf16 path broke, not that precision drifted.
    assert frac <= 0.5
    assert max_byte_delta <= 16


@pytest.mark.slow
def test_refine_batch_scale_iters_drift(levels_table, can_pod5,
                                        can_mappings):
    """Path drift of the batched device DP vs the host path at
    scale_iters in {2, 3} on real reads (scale_iters <= 1 is bit-exact
    by construction and pinned elsewhere)."""
    from remora_tpu.io.read import extract_alignments, iter_signal
    from remora_tpu.io.read_index import ReadIndexedBam
    from remora_tpu.refine.refiner import SigMapRefiner

    bam_idx = ReadIndexedBam(str(can_mappings))
    base_reads = []
    for read_err in iter_signal(str(can_pod5), num_reads=2):
        for io_read, err in extract_alignments(read_err, bam_idx):
            if err is None:
                base_reads.append(io_read.into_remora_read(False))
    assert len(base_reads) >= 2

    for scale_iters in (2, 3):
        smr = SigMapRefiner(
            kmer_model_filename=levels_table,
            do_rough_rescale=True,
            scale_iters=scale_iters,
            do_fix_guage=True,
        )
        # seed the global RNG identically before each path: the precise
        # Theil-Sen rescale subsamples >1000-position reads through
        # np.random (reference RNG semantics), so the two execution
        # orders would otherwise consume different RNG streams and the
        # comparison would measure sampling divergence (~3-7% of
        # positions, with shift/scale jumps), not device numerics
        np.random.seed(1234)
        host_reads = [rd.copy() for rd in base_reads]
        for rd in host_reads:
            rd.refine_signal_mapping(smr)
        np.random.seed(1234)
        dev_reads = [rd.copy() for rd in base_reads]
        errs = smr.refine_reads_batch(dev_reads)
        assert errs == [None] * len(dev_reads)
        n_pos = n_diff = 0
        max_delta = 0
        for h_rd, d_rd in zip(host_reads, dev_reads):
            assert h_rd.seq_to_sig_map.shape == d_rd.seq_to_sig_map.shape
            n_pos += h_rd.seq_to_sig_map.size
            delta = np.abs(
                h_rd.seq_to_sig_map.astype(np.int64)
                - d_rd.seq_to_sig_map.astype(np.int64)
            )
            n_diff += int((delta != 0).sum())
            max_delta = max(max_delta, int(delta.max()))
            # scale state converges identically
            assert h_rd.shift == d_rd.shift and h_rd.scale == d_rd.scale
        frac = n_diff / n_pos
        print(
            f"\nscale_iters={scale_iters}: {n_diff}/{n_pos} path "
            f"positions differ ({frac:.4%}), max |delta| = {max_delta} "
            "samples, device vs host"
        )
        # the contract: drift is rare DP tie-flips from the on-device
        # f32 per-round normalization (measured: <=1/8052 positions,
        # |delta| <= 2 samples on the bundled reads) — not a path
        # rewrite
        assert frac <= 0.005
        assert max_delta <= 8
