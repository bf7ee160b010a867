"""Duplex<->simplex mapping edge cases.

Behavioral parity with the reference's duplex mapping semantics
(reference tests/test_duplex.py 5'/3'/ragged-end scenarios): simplex
overhangs are skipped, duplex overhangs are trimmed (``duplex_offset``
reports the 5' trim), and composing the mapping with a per-base
query->signal map pins unmapped tails at the last mapped position.
"""

import numpy as np

from remora_tpu.core.coords import map_ref_to_signal
from remora_tpu.io.duplex import map_simplex_to_duplex


def _compose(simplex, mapping):
    return map_ref_to_signal(
        query_to_signal=np.arange(len(simplex)),
        ref_to_query_knots=mapping.duplex_to_simplex_mapping,
    )


def test_simplex_5prime_overhang():
    # extra simplex sequence before the duplex match region
    simplex = "TTTTTACGTACGTACG"
    duplex = "ACGTACGTACG"
    m = map_simplex_to_duplex(simplex_seq=simplex, duplex_seq=duplex)
    assert m.trimmed_duplex_seq == duplex
    assert m.duplex_offset == 0
    assert np.array_equal(
        m.duplex_to_simplex_mapping, np.arange(5, 17)
    )
    assert np.array_equal(
        _compose(simplex, m),
        np.array([5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 15]),
    )


def test_duplex_5prime_overhang_trimmed():
    # duplex bases with no simplex signal are trimmed off the front
    simplex = "ACGTACGTACG"
    duplex = "TCGTTACGTACGTACG"
    m = map_simplex_to_duplex(simplex_seq=simplex, duplex_seq=duplex)
    assert m.trimmed_duplex_seq == "ACGTACGTACG"
    assert m.duplex_offset == 5
    assert np.array_equal(m.duplex_to_simplex_mapping, np.arange(12))
    assert np.array_equal(
        _compose(simplex, m),
        np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10]),
    )


def test_both_5prime_overhangs():
    # simplex starts with soft-clipped bases AND duplex has unmatched 5'
    simplex = "GGGTACGTACG"
    duplex = "TCGTTACGTACGTACG"
    m = map_simplex_to_duplex(simplex_seq=simplex, duplex_seq=duplex)
    assert m.trimmed_duplex_seq == "GTACGTACG"
    assert m.duplex_offset == 7
    assert np.array_equal(m.duplex_to_simplex_mapping, np.arange(2, 12))
    assert np.array_equal(
        _compose(simplex, m),
        np.array([2, 3, 4, 5, 6, 7, 8, 9, 10, 10]),
    )


def test_duplex_3prime_overhang_trimmed():
    simplex = "ACGTACGTACG"
    duplex = "ACGTACGTACGTTTCGT"
    m = map_simplex_to_duplex(simplex_seq=simplex, duplex_seq=duplex)
    assert m.trimmed_duplex_seq == "ACGTACGTACG"
    assert m.duplex_offset == 0
    assert np.array_equal(m.duplex_to_simplex_mapping, np.arange(12))
    assert np.array_equal(
        _compose(simplex, m),
        np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10]),
    )


def test_duplex_3prime_overhang_with_simplex_tail():
    # simplex has unaligned tail bases whose signal must not be used
    simplex = "ACGTACGTACGAA"
    duplex = "ACGTACGTACGTTTCGT"
    m = map_simplex_to_duplex(simplex_seq=simplex, duplex_seq=duplex)
    assert m.trimmed_duplex_seq == "ACGTACGTACG"
    assert m.duplex_offset == 0
    assert np.array_equal(m.duplex_to_simplex_mapping, np.arange(12))
    assert np.array_equal(
        _compose(simplex, m),
        np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]),
    )


def test_ragged_ends_simplex_longer():
    simplex = "TTTTTACGTACGTACGTTTTTT"
    duplex = "ACGTACGTACG"
    m = map_simplex_to_duplex(simplex_seq=simplex, duplex_seq=duplex)
    assert m.trimmed_duplex_seq == duplex
    assert m.duplex_offset == 0
    assert np.array_equal(m.duplex_to_simplex_mapping, np.arange(5, 17))
    assert np.array_equal(_compose(simplex, m), np.arange(5, 17))


def test_ragged_ends_duplex_longer():
    simplex = "ACGTACGTACG"
    duplex = "TCGTTACGTACGTACGTTTCGT"
    m = map_simplex_to_duplex(simplex_seq=simplex, duplex_seq=duplex)
    assert m.trimmed_duplex_seq == "ACGTACGTACG"
    assert m.duplex_offset == 5
    assert np.array_equal(m.duplex_to_simplex_mapping, np.arange(12))
    assert np.array_equal(
        _compose(simplex, m),
        np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10]),
    )
