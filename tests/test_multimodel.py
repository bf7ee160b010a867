"""Multi-model inference join logic (one model per canonical base)."""

import numpy as np
import pytest

from remora_tpu.core.pipeline import NamedQueue, put_item, queue_iter
from remora_tpu.infer.infer import batch_reads, run_model_batched, unbatch


class FakeIoRead:
    def __init__(self, read_id):
        self.read_id = read_id


def _fake_md(can_base, chunk_len=8, kmer_len=3):
    return {
        "can_base": can_base,
        "chunk_len": chunk_len,
        "kmer_len": kmer_len,
        "kmer_context_bases": (1, 1),
        "mod_bases": ["m"],
        "mod_long_names": ["5mC"],
    }


def _read_inputs(read_id, n_chunks, mds, seed):
    rng = np.random.default_rng(seed)
    bases_chunks = {}
    for md in mds:
        bases_chunks[md["can_base"]] = {
            "signal": rng.normal(
                size=(n_chunks, 1, md["chunk_len"])
            ).astype(np.float32),
            "enc_kmers": rng.normal(
                size=(n_chunks, md["kmer_len"] * 4, md["chunk_len"])
            ).astype(np.float32),
            "read_focus_bases": np.arange(n_chunks),
        }
    return (FakeIoRead(read_id), bases_chunks, None)


def test_multimodel_batching_and_unbatch():
    mds = [_fake_md("C"), _fake_md("A")]
    # eval fns tag outputs with a per-model constant + per-chunk signal sum
    def make_eval(tag):
        def eval_fn(sigs, kmers):
            s = sigs.sum(axis=(1, 2))
            return np.stack([s, np.full_like(s, tag)], axis=1)

        return eval_fn

    eval_fns = {"C": make_eval(1.0), "A": make_eval(2.0)}

    reads = [
        [_read_inputs("r1", 5, mds, 0)],
        [_read_inputs("r2", 9, mds, 1)],
        [(FakeIoRead("r3"), None, "some error")],
        [_read_inputs("r4", 3, mds, 2)],
    ]
    batch_size = 4
    batches_q = NamedQueue(maxsize=100)
    batch_reads(iter(reads), batches_q, batch_size, mds)
    called_q = NamedQueue(maxsize=100)
    run_model_batched(batches_q, called_q, eval_fns, batch_size)
    out_q = NamedQueue(maxsize=100)
    unbatch(called_q, out_q, mds)

    results = {}
    for io_read, mod_calls, err in queue_iter(out_q):
        results[io_read.read_id] = (mod_calls, err)

    assert set(results) == {"r1", "r2", "r3", "r4"}
    assert results["r3"][1] is not None  # error propagated
    for rid, n_chunks, seed in (("r1", 5, 0), ("r2", 9, 1), ("r4", 3, 2)):
        mod_calls, err = results[rid]
        assert err is None
        # both canonical-base models contributed
        assert sorted(cb for cb, _o, _p in mod_calls) == ["A", "C"]
        for cb, nn_out, poss in mod_calls:
            assert nn_out.shape == (n_chunks, 2)
            assert np.array_equal(poss, np.arange(n_chunks))
            # per-model tag survived batching across read boundaries
            expected_tag = 1.0 if cb == "C" else 2.0
            assert np.all(nn_out[:, 1] == expected_tag)
            # chunk-order preserved: recompute signal sums
            inputs = _read_inputs(rid, n_chunks, mds, seed)[1][cb]
            sums = inputs["signal"].sum(axis=(1, 2))
            assert np.allclose(nn_out[:, 0], sums, atol=1e-5)
