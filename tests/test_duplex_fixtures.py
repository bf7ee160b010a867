"""Reference-pinned duplex mapping fixtures.

The reference pins exact ``duplex_to_simplex_mapping`` arrays (and the
derived duplex->signal knots) on hand-drawn alignments
(``/root/reference/tests/test_duplex.py:57-251``). Those EXPECTATIONS —
the data, not the code — are ported here verbatim against
``io/duplex.py::map_simplex_to_duplex`` + ``core/coords.py::
map_ref_to_signal``, breaking the self-referential symmetry of the
property fuzz in ``test_aligner_fuzz.py`` on boundary semantics
(5'/3' overhangs, soft-clipped unpaired ends, ragged ends).
"""

import numpy as np
import pytest

from remora_tpu.core.coords import map_ref_to_signal
from remora_tpu.io.duplex import map_simplex_to_duplex

# (label, simplex, duplex,
#  expected trimmed duplex, expected duplex offset,
#  expected duplex_to_simplex_mapping,
#  expected duplex->signal knots for query_to_signal=arange(len(simplex)))
CASES = [
    (
        # simplex has extra 5' sequence; duplex untouched
        # TTTTTACGTACGTACG  [simplex]
        #      |||||||||||
        # -----ACGTACGTACG  [duplex]
        "extra_5prime_simplex",
        "TTTTTACGTACGTACG",
        "ACGTACGTACG",
        "ACGTACGTACG",
        0,
        [5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16],
        [5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 15],
    ),
    (
        # simplex missing 5' sequence: leading duplex bases trimmed
        # -----ACGTACGTACG
        #      |||||||||||
        # TCGTTACGTACGTACG
        "missing_5prime_simplex",
        "ACGTACGTACG",
        "TCGTTACGTACGTACG",
        "ACGTACGTACG",
        5,
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10],
    ),
    (
        # missing 5' sequence AND leading unpaired simplex bases
        # GG-------GTACGTACG
        #          |||||||||
        # --TCGTTACGTACGTACG
        "missing_5prime_plus_softclip",
        "GGGTACGTACG",
        "TCGTTACGTACGTACG",
        "GTACGTACG",
        7,
        [2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
        [2, 3, 4, 5, 6, 7, 8, 9, 10, 10],
    ),
    (
        # simplex missing 3' sequence: trailing duplex bases trimmed
        # ACGTACGTACG------
        # |||||||||||
        # ACGTACGTACGTTTCGT
        "missing_3prime_simplex",
        "ACGTACGTACG",
        "ACGTACGTACGTTTCGT",
        "ACGTACGTACG",
        0,
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10],
    ),
    (
        # missing 3' sequence AND trailing unaligned simplex bases
        # ACGTACGTACG------AA
        # |||||||||||
        # ACGTACGTACGTTTCGT--
        "missing_3prime_plus_unaligned",
        "ACGTACGTACGAA",
        "ACGTACGTACGTTTCGT",
        "ACGTACGTACG",
        0,
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
    ),
    (
        # ragged simplex ends on both sides
        # TTTTTACGTACGTACGTTTTTT [simplex]
        #      |||||||||||
        # -----ACGTACGTACG------ [duplex]
        "ragged_simplex_both_ends",
        "TTTTTACGTACGTACGTTTTTT",
        "ACGTACGTACG",
        "ACGTACGTACG",
        0,
        [5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16],
        [5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16],
    ),
    (
        # ragged duplex ends on both sides
        # -----ACGTACGTACG------
        #      |||||||||||
        # TCGTTACGTACGTACGTTTCGT
        "ragged_duplex_both_ends",
        "ACGTACGTACG",
        "TCGTTACGTACGTACGTTTCGT",
        "ACGTACGTACG",
        5,
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10],
    ),
]


@pytest.mark.parametrize(
    "case", CASES, ids=[c[0] for c in CASES]
)
def test_duplex_mapping_reference_fixture(case):
    (_label, simplex, duplex, exp_trimmed, exp_offset, exp_d2s,
     exp_d2sig) = case
    m = map_simplex_to_duplex(simplex_seq=simplex, duplex_seq=duplex)
    assert m.trimmed_duplex_seq == exp_trimmed
    assert m.duplex_offset == exp_offset
    assert np.array_equal(
        m.duplex_to_simplex_mapping, np.asarray(exp_d2s)
    ), m.duplex_to_simplex_mapping
    d2sig = map_ref_to_signal(
        query_to_signal=np.arange(len(simplex)),
        ref_to_query_knots=m.duplex_to_simplex_mapping,
    )
    assert np.array_equal(d2sig, np.asarray(exp_d2sig)), d2sig
