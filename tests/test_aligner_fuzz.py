"""Pairwise-aligner fuzz suite (reference analog: the 75-case parasail
fuzz in tests/test_duplex.py:15-54).

Without parasail in this environment, correctness is pinned two ways:
the native C++ kernel is cross-checked against the independent NumPy
DP implementation (same scoring model, different code path), and
`map_simplex_to_duplex` outputs are property-checked on mutated reads
(monotonic mapping, coordinate consistency, near-identity recovery).
"""

import numpy as np
import pytest

from remora_tpu.io.duplex import map_simplex_to_duplex
from remora_tpu.io.native import get_lib, sg_align_native, sg_align_numpy

BASES = np.frombuffer(b"ACGT", np.uint8)


def _rand_seq(rng, n):
    return bytes(rng.choice(BASES, size=n)).decode()


def _mutate(rng, seq, sub_rate=0.05, indel_rate=0.10):
    out = []
    for ch in seq:
        r = rng.random()
        if r < indel_rate / 2:
            continue  # deletion
        if r < indel_rate:
            out.append(chr(BASES[rng.integers(4)]))  # insertion
        if rng.random() < sub_rate:
            out.append(chr(BASES[rng.integers(4)]))
        else:
            out.append(ch)
    return "".join(out)


def _score(cigar, q, r, qs, rs, gap_open=10, gap_extend=2):
    """Recompute the alignment score from a trimmed cigar."""
    score = 0
    qi, ri = qs, rs
    for op, ln in cigar:
        if op == 0:
            for _ in range(ln):
                score += 5 if q[qi] == r[ri] else -4
                qi += 1
                ri += 1
        elif op == 1:
            score -= gap_open + gap_extend * ln
            qi += ln
        else:
            score -= gap_open + gap_extend * ln
            ri += ln
    return score, qi, ri


def _gotoh_sg_score(q, r, gap_open=10, gap_extend=2):
    """Independent scalar Gotoh DP: optimal score with free REF
    overhangs and the query consumed globally (the native kernel's
    contract; `pairwise_align` builds sg_qx on top by operand swap)."""
    NEG = -(1 << 30)
    n, m = len(q), len(r)
    goe = gap_open + gap_extend
    H = [0] * (m + 1)  # free leading ref overhang
    F = [NEG] * (m + 1)
    for i in range(1, n + 1):
        Hn = [0] * (m + 1)
        Fn = [0] * (m + 1)
        Fn[0] = max(H[0] - goe, F[0] - gap_extend)
        Hn[0] = Fn[0]
        E = NEG
        qc = q[i - 1]
        for j in range(1, m + 1):
            E = max(Hn[j - 1] - goe, E - gap_extend)
            Fn[j] = max(H[j] - goe, F[j] - gap_extend)
            rc = r[j - 1]
            if qc in "ACGT" and rc in "ACGT":
                sub = 5 if qc == rc else -4
            else:
                sub = -2
            Hn[j] = max(H[j - 1] + sub, E, Fn[j])
        H, F = Hn, Fn
    return max(H)


def _full_score(res, query, ref, gap_open=10, gap_extend=2):
    """DP score of a (trimmed-cigar) result in the native contract:
    trimmed leading/trailing QUERY gaps were penalized in the DP
    (query consumed globally), ref overhangs were free."""
    cigar, ref_start, ref_end, query_start, query_end = res
    s, qi, ri = _score(cigar, query, ref, query_start, ref_start)
    assert qi == query_end and ri == ref_end
    lead_i, trail_i = query_start, len(query) - query_end
    if lead_i:
        s -= gap_open + gap_extend * lead_i
    if trail_i:
        s -= gap_open + gap_extend * trail_i
    return s


@pytest.mark.skipif(get_lib() is None, reason="native library unavailable")
def test_native_matches_numpy_and_gotoh_fuzz():
    rng = np.random.default_rng(1234)
    for trial in range(75):
        n = int(rng.integers(20, 220))
        ref = _rand_seq(rng, n)
        query = _mutate(rng, ref)
        # ragged overhangs on either side
        if trial % 3 == 0:
            query = _rand_seq(rng, int(rng.integers(0, 15))) + query
        if trial % 3 == 1:
            query = query + _rand_seq(rng, int(rng.integers(0, 15)))
        if not query:
            continue
        nat = sg_align_native(query, ref)
        npy = sg_align_numpy(query, ref)
        opt = _gotoh_sg_score(query, ref)
        assert _full_score(nat, query, ref) == opt, (trial, nat)
        assert _full_score(npy, query, ref) == opt, (trial, npy)


def test_simplex_duplex_mapping_fuzz():
    rng = np.random.default_rng(99)
    for trial in range(75):
        n = int(rng.integers(200, 2000))
        duplex = _rand_seq(rng, n)
        simplex = _mutate(rng, duplex)
        # ragged simplex ends (adapter/unpaired sequence)
        simplex = (
            _rand_seq(rng, int(rng.integers(0, 30)))
            + simplex
            + _rand_seq(rng, int(rng.integers(0, 30)))
        )
        m = map_simplex_to_duplex(simplex_seq=simplex, duplex_seq=duplex)
        k = m.duplex_to_simplex_mapping
        assert k.size == len(m.trimmed_duplex_seq) + 1
        assert np.all(np.diff(k) >= 0), "mapping must be monotonic"
        assert 0 <= k[0] and k[-1] <= len(simplex)
        assert (
            duplex[m.duplex_offset : m.duplex_offset + len(m.trimmed_duplex_seq)]
            == m.trimmed_duplex_seq
        )
        # at 5% substitution / 10% indel most of the duplex must align
        assert len(m.trimmed_duplex_seq) > 0.8 * n, trial
