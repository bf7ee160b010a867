"""Benchmark the vectorized super-batch chunk-context trimmer.

Compares remora_tpu.data.dataset.trim_sb_chunk_context (fully
vectorized) against the per-row loop formulation it replaced
(equivalent to the reference Cython ``trim_sb_chunk_context_core``
data_chunks_core.pyx:10–45 run row-by-row from Python).

Run: python benchmarks/bench_trim.py
"""

import time

import numpy as np

from remora_tpu.data.dataset import trim_sb_chunk_context


def _loop_trim(stored_cc, cc, total_seq_context, seqs, seq_mappings, seq_lens):
    """Per-row Python loop baseline (round-1 implementation)."""
    new_width = cc[0] + cc[1]
    Sp1 = seq_mappings.shape[1]
    s_idx = np.arange(Sp1)[None, :]
    valid = s_idx <= seq_lens[:, None]
    m = np.where(valid, seq_mappings, np.int32(1 << 30))
    ends_after_zero = (m[:, 1:] > 0) & valid[:, 1:]
    new_first = np.argmax(ends_after_zero, axis=1)
    starts_before_w = (m[:, :-1] < new_width) & valid[:, :-1]
    new_last = Sp1 - 2 - np.argmax(starts_before_w[:, ::-1], axis=1)
    new_lens = (new_last - new_first + 1).astype(seq_lens.dtype)
    for b in range(seq_lens.shape[0]):
        nf, sl = int(new_first[b]), int(new_lens[b])
        if nf > 0:
            seq_mappings[b, : sl + 1] = seq_mappings[b, nf : nf + sl + 1]
            seqs[b, : sl + total_seq_context] = seqs[
                b, nf : nf + sl + total_seq_context
            ]
        seq_mappings[b, 0] = 0
        seq_mappings[b, sl] = new_width
        np.clip(
            seq_mappings[b, : sl + 1], 0, new_width,
            out=seq_mappings[b, : sl + 1],
        )
        seq_lens[b] = sl
    return seqs, seq_mappings, seq_lens


def make_inputs(batch=2048, max_seq=80, stored_cc=(200, 200), cc=(150, 150),
                seed=7):
    rng = np.random.default_rng(seed)
    seq_lens = rng.integers(20, max_seq, batch).astype(np.int16)
    seq_mappings = np.zeros((batch, max_seq + 1), dtype=np.int16)
    stored_w = sum(stored_cc)
    for i, n in enumerate(seq_lens):
        cuts = np.sort(rng.integers(0, stored_w, n - 1))
        seq_mappings[i, : n + 1] = np.concatenate(([0], cuts, [stored_w]))
    # shift as the caller does before trimming
    seq_mappings -= stored_cc[0] - cc[0]
    seqs = rng.integers(0, 4, (batch, max_seq + 8), dtype=np.int8)
    return seqs, seq_mappings, seq_lens


def run(fn, stored_cc=(200, 200), cc=(150, 150), iters=20):
    times = []
    for _ in range(iters):
        seqs, maps, lens = make_inputs(stored_cc=stored_cc, cc=cc)
        t0 = time.perf_counter()
        fn(stored_cc, cc, 8, seqs, maps, lens)
        times.append(time.perf_counter() - t0)
    return min(times), (seqs, maps, lens)


def main():
    stored_cc, cc = (200, 200), (150, 150)
    t_loop, loop_out = run(_loop_trim, stored_cc, cc)
    t_vec, vec_out = run(trim_sb_chunk_context, stored_cc, cc)
    # equality on the live (valid) regions
    for (a, b, name) in zip(loop_out, vec_out, ("seqs", "maps", "lens")):
        if name == "lens":
            assert np.array_equal(a, b), "length mismatch"
    lens = loop_out[2]
    for i, n in enumerate(lens):
        assert np.array_equal(
            loop_out[1][i, : n + 1], vec_out[1][i, : n + 1]
        ), f"map row {i}"
        assert np.array_equal(
            loop_out[0][i, : n + 8], vec_out[0][i, : n + 8]
        ), f"seq row {i}"
    print(
        f"batch=2048 loop={t_loop * 1e3:.2f}ms vectorized={t_vec * 1e3:.2f}ms "
        f"speedup={t_loop / t_vec:.1f}x"
    )


if __name__ == "__main__":
    main()
