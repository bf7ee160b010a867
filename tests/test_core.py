"""Unit tests for the core layer (seq, motifs, coords, tags, metrics)."""

import numpy as np
import pytest

from remora_tpu.core import coords, seq as sequtil
from remora_tpu.core.tags import format_mm_ml_tags, softmax


def test_seq_roundtrip():
    s = "ACGTNACGT"
    enc = sequtil.seq_to_int(s)
    assert enc.tolist() == [0, 1, 2, 3, -1, 0, 1, 2, 3]
    assert sequtil.int_to_seq(enc) == s


def test_revcomp():
    assert sequtil.revcomp("ACGT") == "ACGT"
    assert sequtil.revcomp("AACG") == "CGTT"
    assert sequtil.comp("ACGTB") == "TGCAV"
    assert np.array_equal(
        sequtil.revcomp_int(np.array([0, 0, 1, 2])), np.array([1, 2, 3, 3])
    )


def test_motif_findall():
    m = sequtil.Motif("CG", 0)
    int_seq = sequtil.seq_to_int("ACGCGTTCG")
    hits = m.findall(int_seq)
    assert hits.tolist() == [1, 3, 7]
    assert m.focus_base == "C"
    # ambiguous motif
    drach = sequtil.Motif("DRACH", 2)
    seq = sequtil.seq_to_int("TTGGACTTT")
    assert drach.findall(seq).tolist() == [2]
    assert drach.match(seq, 4)
    assert not drach.match(seq, 3)


def test_motif_n_trim():
    m = sequtil.Motif("NNCGN", 2)
    assert m.raw_motif == "CG"
    assert m.focus_pos == 0


def test_motif_merge():
    a = sequtil.Motif("CG", 0)
    b = sequtil.Motif("CA", 0)
    merged = a.merge(b)
    assert merged.raw_motif == "CR"
    ms = sequtil.merge_motifs([("CG", 0), ("CA", 0), ("CC", 0), ("CT", 0)])
    assert len(ms) == 1
    assert ms[0].raw_motif == "C"


def test_find_focus_bases():
    motifs = [sequtil.Motif("CG", 0), sequtil.Motif("CA", 0)]
    int_seq = sequtil.seq_to_int("CGCATT")
    hits = set(sequtil.find_focus_bases(int_seq, motifs).tolist())
    assert hits == {0, 2}


def test_cigar_parse():
    cig = coords.cigartuples_from_string("10M2I3D5M")
    assert cig == [(0, 10), (1, 2), (2, 3), (0, 5)]
    assert coords.cigartuples_to_string(cig) == "10M2I3D5M"


def test_coordinate_mapping_identity():
    # perfect match: identity mapping
    knots = coords.make_sequence_coordinate_mapping([(0, 10)])
    assert np.allclose(knots, np.arange(11))


def test_coordinate_mapping_indel():
    # 5M 2D 5M: ref len 12, query len 10
    knots = coords.make_sequence_coordinate_mapping([(0, 5), (2, 2), (0, 5)])
    assert knots.size == 13
    assert knots[0] == 0 and knots[-1] == 10
    # deletion region interpolates between query positions 4 and 5
    assert np.all(np.diff(knots) >= 0)


def test_ref_to_signal():
    q2s = np.arange(0, 101, 10)
    r2s = coords.compute_ref_to_signal(q2s, [(0, 10)])
    assert np.array_equal(r2s, q2s)


def test_move_table():
    moves = np.zeros(20, dtype=np.uint8)
    moves[[0, 4, 9, 15]] = 1
    q2s = coords.parse_move_table(5, moves, 100, seq_len=4)
    assert q2s.tolist() == [0, 20, 45, 75, 100]
    # reverse signal
    q2s_r = coords.parse_move_table(5, moves, 100, seq_len=4,
                                    reverse_signal=True)
    assert q2s_r.tolist() == [0, 25, 55, 80, 100]


def test_softmax():
    x = np.array([[1.0, 2.0], [3.0, 1.0]])
    sm = softmax(x)
    assert np.allclose(sm.sum(axis=1), 1.0)
    assert sm[0, 1] > sm[0, 0]


def test_mm_ml_tags():
    seq = "ACGCGT"
    poss = [1, 3]
    probs = [np.array([0.25]), np.array([1.0])]
    mm, ml = format_mm_ml_tags(seq, poss, probs, ["m"], "C")
    assert mm == "C+m?,0,0;"
    assert list(ml) == [64, 255]


def test_mm_ml_tags_multi_mod():
    seq = "CCC"
    poss = [0, 2]
    probs = [np.array([0.5, 0.25]), np.array([0.125, 0.0625])]
    mm, ml = format_mm_ml_tags(seq, poss, probs, ["h", "m"], "C")
    assert mm == "C+h?,0,1;C+m?,0,1;"
    assert list(ml) == [128, 32, 64, 16]
