"""Coordinate mapping math: CIGAR -> ref/query knots -> signal positions.

Behavioral parity with the reference (``src/remora/data_chunks.py:29–122``):
piecewise-linear interpolation through alignment-match "knots", composed
with the move-table query->signal map, floored to integer signal indices.
"""

import re

import numpy as np

from remora_tpu import RemoraError

# CIGAR op tables indexed by numeric op code (M I D N S H P = X)
CIGAR_CODES = "MIDNSHP=X"
CODE_TO_OP = {c: i for i, c in enumerate(CIGAR_CODES)}
MATCH_OPS = np.array([True, False, False, False, False, False, False, True, True])
QUERY_OPS = np.array([True, True, False, False, True, False, False, True, True])
REF_OPS = np.array([True, False, True, True, False, False, False, True, True])
MATCH_OPS_SET = frozenset(np.where(MATCH_OPS)[0].tolist())

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def cigartuples_from_string(cigarstring):
    """Parse a CIGAR string into a list of (op, length) tuples."""
    return [
        (CODE_TO_OP[m.group(2)], int(m.group(1)))
        for m in _CIGAR_RE.finditer(cigarstring)
    ]


def cigartuples_to_string(cigartuples):
    return "".join(f"{ln}{CIGAR_CODES[op]}" for op, ln in cigartuples)


def make_sequence_coordinate_mapping(cigar):
    """Map each reference position to a (fractional) query position.

    Args:
        cigar: list of (op, length) tuples

    Returns:
        float array of shape (ref_len + 1,): query coordinate assigned to
        each reference coordinate (knot interpolation over match ops).
    """
    while len(cigar) > 0 and cigar[-1][0] not in MATCH_OPS_SET:
        cigar = cigar[:-1]
    if len(cigar) == 0:
        raise RemoraError("No match operations found in alignment cigar")
    ops, lens = map(np.array, zip(*cigar))
    if ops.min() < 0 or ops.max() > 8:
        raise RemoraError("Invalid cigar op(s)")
    if lens.min() < 0:
        raise RemoraError("Cigar lengths may not be negative")

    is_match = MATCH_OPS[ops]
    match_counts = lens[is_match]
    # for each match run of length L ending at cumulative position c we add
    # knots at (c - L) and (c - 1) in both coordinate systems
    offsets = np.array([match_counts, np.ones_like(match_counts)])

    ref_knots = np.cumsum(np.where(REF_OPS[ops], lens, 0))
    ref_knots = np.concatenate(
        [[0], (ref_knots[is_match] - offsets).T.flatten(), [ref_knots[-1]]]
    )
    query_knots = np.cumsum(np.where(QUERY_OPS[ops], lens, 0))
    query_knots = np.concatenate(
        [[0], (query_knots[is_match] - offsets).T.flatten(), [query_knots[-1]]]
    )
    return np.interp(np.arange(ref_knots[-1] + 1), ref_knots, query_knots)


def map_ref_to_signal(*, query_to_signal, ref_to_query_knots):
    """Compose ref->query knots with the query->signal map (floored)."""
    return np.floor(
        np.interp(
            ref_to_query_knots,
            np.arange(query_to_signal.size),
            query_to_signal,
        )
    ).astype(int)


def compute_ref_to_signal(query_to_signal, cigar):
    """Reference-position -> signal-index mapping for an aligned read."""
    knots = make_sequence_coordinate_mapping(cigar)
    return map_ref_to_signal(
        query_to_signal=query_to_signal, ref_to_query_knots=knots
    )


def parse_move_table(stride, moves, sig_len, seq_len=None, check=True,
                     reverse_signal=False):
    """Convert a basecaller move table to a query->signal mapping.

    Args:
        stride: basecall model stride
        moves: 0/1 array, one entry per stride of signal
        sig_len: total signal length
        seq_len: expected basecall length (for validation)
        reverse_signal: flip mapping for 3'->5' (RNA) signal

    Returns:
        int array of length (num_bases + 1) giving signal start index per
        base plus the end-of-signal terminator.
    """
    moves = np.asarray(moves)
    query_to_signal = np.nonzero(moves)[0] * stride
    query_to_signal = np.concatenate([query_to_signal, [sig_len]])
    if reverse_signal:
        query_to_signal = sig_len - query_to_signal[::-1]
    if check and seq_len is not None and query_to_signal.size - 1 != seq_len:
        raise RemoraError("Move table discordant with basecalls")
    if check and moves.size != sig_len // stride:
        raise RemoraError("Move table discordant with signal")
    return query_to_signal
