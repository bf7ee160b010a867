"""Nucleotide sequence encoding and IUPAC motif matching.

Behavioral parity with the reference (``src/remora/util.py:25–158,
190–426``): integer encoding A=0 C=1 G=2 T=3, N/other=-1; IUPAC
single-letter ambiguity codes; vectorized motif findall over integer
sequences; motif merge closure used when composing datasets.
"""

from dataclasses import dataclass
from itertools import product
import re

import numpy as np

from remora_tpu import RemoraError

CAN_ALPHABET = "ACGT"
CONV_ALPHABET = "ACGTN"
SINGLE_LETTER_CODE = {
    "A": "A",
    "C": "C",
    "G": "G",
    "T": "T",
    "B": "CGT",
    "D": "AGT",
    "H": "ACT",
    "K": "GT",
    "M": "AC",
    "N": "ACGT",
    "R": "AG",
    "S": "CG",
    "V": "ACG",
    "W": "AT",
    "Y": "CT",
}
BASES_TO_CODES = {v: k for k, v in SINGLE_LETTER_CODE.items()}

# 256-entry lookup: ASCII byte -> integer base code (or -1)
_BYTE_TO_INT = np.full(256, -1, dtype=np.int8)
for _i, _b in enumerate(CAN_ALPHABET):
    _BYTE_TO_INT[ord(_b)] = _i
    _BYTE_TO_INT[ord(_b.lower())] = _i

_COMP_TABLE = str.maketrans("ACGTBVDHKMRYacgtbvdhkmry", "TGCAVBHDMKYRtgcavbhdmkyr")
_U_TO_T = str.maketrans("Uu", "Tt")
_T_TO_U = str.maketrans("Tt", "Uu")

# integer complement (canonical bases only)
INT_COMP = np.array([3, 2, 1, 0], dtype=np.intp)


def seq_to_int(seq):
    """Encode string sequence as int8 array (A=0 C=1 G=2 T=3, other=-1)."""
    return _BYTE_TO_INT[np.frombuffer(seq.encode("ascii"), dtype=np.uint8)]


def int_to_seq(int_seq, alphabet=CONV_ALPHABET):
    """Decode integer array to string sequence; -1 maps to final alphabet char."""
    int_seq = np.asarray(int_seq)
    if int_seq.size == 0:
        return ""
    if int_seq.max() >= len(alphabet):
        raise RemoraError(f"Invalid value in int sequence ({int_seq.max()})")
    lut = np.frombuffer(alphabet.encode("ascii"), dtype=np.uint8)
    return lut[int_seq].tobytes().decode("ascii")


def comp(seq):
    return seq.translate(_COMP_TABLE)


def revcomp(seq):
    return seq.upper().translate(_COMP_TABLE)[::-1]


def comp_int(int_seq):
    return INT_COMP[int_seq]


def revcomp_int(int_seq):
    return INT_COMP[int_seq][::-1]


def u_to_t(seq):
    return seq.translate(_U_TO_T)


def t_to_u(seq):
    return seq.translate(_T_TO_U)


@dataclass
class Motif:
    """IUPAC sequence motif with a focus position.

    Args:
        raw_motif: motif string of IUPAC single-letter codes
        focus_pos: 0-based focus index within the motif
    """

    raw_motif: str
    focus_pos: int = 0

    def __post_init__(self):
        try:
            self.focus_pos = int(self.focus_pos)
        except ValueError:
            raise RemoraError(
                f'Motif focus position not an integer: "{self.focus_pos}"'
            )
        if not isinstance(self.raw_motif, str):
            raise RemoraError("Motif sequence must be a string")
        bad = set(self.raw_motif).difference(SINGLE_LETTER_CODE)
        if bad:
            raise RemoraError(f"Motif contains invalid characters: {bad}")
        if self.focus_pos >= len(self.raw_motif):
            raise RemoraError("Motif focus position is past the end of the motif")
        # trim uninformative N bases from either end
        while len(self.raw_motif) > 1 and self.raw_motif[0] == "N":
            self.raw_motif = self.raw_motif[1:]
            self.focus_pos -= 1
        while len(self.raw_motif) > 1 and self.raw_motif[-1] == "N":
            self.raw_motif = self.raw_motif[:-1]

    def to_tuple(self):
        return self.raw_motif, self.focus_pos

    def __hash__(self):
        return hash(self.to_tuple())

    @property
    def focus_base(self):
        return self.raw_motif[self.focus_pos]

    @property
    def num_bases_after_focus(self):
        return len(self.raw_motif) - self.focus_pos - 1

    @property
    def pattern(self):
        # lookahead so overlapping hits are found
        pat = "".join(f"[{SINGLE_LETTER_CODE[c]}]" for c in self.raw_motif)
        return re.compile(f"(?=({pat}))")

    @property
    def int_pattern(self):
        """Allowed integer bases per motif position (list of arrays)."""
        return [
            np.array(
                [i for i, b in enumerate(CAN_ALPHABET) if b in SINGLE_LETTER_CODE[c]]
            )
            for c in self.raw_motif
        ]

    @property
    def possible_kmers(self):
        return [
            "".join(bs)
            for bs in product(*[SINGLE_LETTER_CODE[c] for c in self.raw_motif])
        ]

    def findall(self, int_seq):
        """Focus positions of all motif hits within an integer sequence.

        Vectorized: AND-reduce per-offset membership tests over shifted
        views (reference analog ``util.py:281``). Returned positions are
        motif *start* positions; add focus_pos for focus coordinates.
        """
        mlen = len(self.raw_motif)
        if int_seq.size < mlen:
            return np.empty(0, dtype=np.int64)
        hits = np.logical_and.reduce(
            [
                np.isin(int_seq[off : int_seq.size - mlen + off + 1], allowed)
                for off, allowed in enumerate(self.int_pattern)
            ]
        )
        return np.where(hits)[0]

    def match(self, int_seq, pos):
        """Does the motif match centered at focus position ``pos``?

        Pattern positions falling outside the read are ignored (clipped),
        matching reference semantics.
        """
        pat_st = pos - self.focus_pos
        pat_en = pos + self.num_bases_after_focus + 1
        int_pat = self.int_pattern
        if pat_st < 0:
            int_pat = int_pat[-pat_st:]
            pat_st = 0
        if pat_en > int_seq.size:
            int_pat = int_pat[: len(int_pat) - pat_en + int_seq.size]
            pat_en = int_seq.size
        return all(
            np.isin(base, allowed)
            for allowed, base in zip(int_pat, int_seq[pat_st:pat_en])
        )

    def is_super_set(self, other):
        """Are all sequences matching ``other`` also matched by this motif?"""
        if (
            self.focus_pos > other.focus_pos
            or self.num_bases_after_focus > other.num_bases_after_focus
        ):
            return False
        trimmed = other.raw_motif[
            other.focus_pos - self.focus_pos : other.focus_pos
            + self.num_bases_after_focus
            + 1
        ]
        for sb, ob in zip(self.raw_motif, trimmed):
            if any(b not in SINGLE_LETTER_CODE[sb] for b in SINGLE_LETTER_CODE[ob]):
                return False
        return True

    def merge(self, other):
        """Merge with another motif when the union is expressible as one motif."""
        if self == other or self.is_super_set(other):
            return self
        if other.is_super_set(self):
            return other
        if len(self.raw_motif) != len(other.raw_motif):
            raise RemoraError("Cannot merge motifs of different sizes")
        if self.focus_pos != other.focus_pos:
            raise RemoraError("Cannot merge motifs with different focus pos")
        all_kmers = set(self.possible_kmers).union(other.possible_kmers)
        merged = Motif(
            "".join(
                BASES_TO_CODES[
                    "".join(sorted(set(k[i] for k in all_kmers)))
                ]
                for i in range(len(self.raw_motif))
            ),
            self.focus_pos,
        )
        # if merged motif got N-trimmed, re-expand for the exactness check
        if len(merged.raw_motif) < len(self.raw_motif):
            st = self.focus_pos - merged.focus_pos
            en = len(self.raw_motif) - len(merged.raw_motif) - st
            pos_bases = (
                [CAN_ALPHABET] * st
                + [SINGLE_LETTER_CODE[c] for c in merged.raw_motif]
                + [CAN_ALPHABET] * en
            )
            merged_kmers = set("".join(bs) for bs in product(*pos_bases))
        else:
            merged_kmers = set(merged.possible_kmers)
        if all_kmers != merged_kmers:
            raise RemoraError(f"Cannot merge motifs {self} {other}")
        return merged


def merge_motifs(motifs):
    """Pairwise-merge closure over a list of motifs (or (seq, off) tuples)."""
    motifs = [m if isinstance(m, Motif) else Motif(*m) for m in motifs]
    motifs = list(set(motifs))
    prev = None
    while len(motifs) > 1 and (prev is None or set(prev) != set(motifs)):
        prev = motifs
        consumed = set()
        out = set()
        for ma in prev:
            for mb in prev[1:]:
                try:
                    mm = ma.merge(mb)
                    if mm != ma:
                        consumed.add(ma)
                    if mm != mb:
                        consumed.add(mb)
                    out.add(mm)
                except RemoraError:
                    out.update((ma, mb))
        motifs = list(out.difference(consumed))
    return motifs


def find_focus_bases(int_seq, motifs):
    """Positions of any-motif focus hits within an integer sequence.

    Note: matches reference (``util.py:413``) in returning set-ordered
    (unsorted, deduplicated) positions.
    """
    return np.fromiter(
        set(
            int(pos) + mot.focus_pos
            for mot in motifs
            for pos in mot.findall(int_seq)
        ),
        dtype=np.int64,
    )


def get_can_converter(alphabet, collapse_alphabet):
    """Map full-alphabet integer codes to canonical-alphabet integer codes."""
    can_bases = "".join(
        cb for mb, cb in zip(alphabet, collapse_alphabet) if mb == cb
    )
    return np.array([can_bases.find(b) for b in collapse_alphabet], dtype=np.int8)


def get_mod_bases(alphabet, collapse_alphabet):
    return [mb for mb, cb in zip(alphabet, collapse_alphabet) if mb != cb]


def validate_mod_bases(mod_bases, motifs, alphabet, collapse_alphabet, control=False):
    """Check mutual consistency; return label conversion (alphabet idx -> class)."""
    if len(set(mod_bases)) < len(mod_bases):
        raise RemoraError("Single letter modified base codes must be unique.")
    can_base = motifs[0].focus_base
    if any(mot.focus_base != can_base for mot in motifs):
        raise RemoraError("All motifs must be alternatives to the same canonical base")
    can_base_idx = alphabet.find(can_base)
    label_conv = np.full(len(alphabet), -1, dtype=np.int8)
    label_conv[can_base_idx] = 0
    if control:
        return label_conv
    for mod_base in mod_bases:
        if mod_base not in alphabet:
            raise RemoraError("Modified base provided not found in alphabet")
        mod_can_equiv = collapse_alphabet[alphabet.find(mod_base)]
        if mod_can_equiv != can_base:
            raise RemoraError(
                f"Canonical base within motif ({can_base}) does not match "
                f"canonical equivalent for modified base ({mod_can_equiv})"
            )
    for mod_i, mod_base in enumerate(mod_bases):
        label_conv[alphabet.find(mod_base)] = mod_i + 1
    return label_conv
