"""SAM MM/ML modified-base tag formatting.

Behavioral parity with the reference (``src/remora/util.py:485–537``):
`?`-style skip semantics, delta gaps counted in same-canonical-base
coordinates, ML probabilities scaled as floor(p*256) clipped to 255.
"""

import array

import numpy as np


def softmax(x, axis=1):
    """Numerically stable softmax along the given axis (float64 internally)."""
    x = np.asarray(x)
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def format_mm_ml_tags(seq, poss, probs, mod_bases, can_base, strand="+"):
    """Format MM and ML tag contents for one read.

    Args:
        seq: read-oriented sequence string (revcomp for reference-anchored
            reverse-strand calls)
        poss: positions of calls relative to ``seq``
        probs: per-call modified-base probabilities, shape (ncalls, nmods)
            (entries may be None to skip a call)
        mod_bases: modified-base single-letter/ChEBI codes
        can_base: canonical base letter
        strand: "+" for SEQ orientation, "-" for complement strand

    Returns:
        (mm_tag string, ml array.array('B'))
    """
    per_mod = {mb: [] for mb in mod_bases}
    for pos, mod_probs in sorted(zip(poss, probs), key=lambda x: x[0]):
        if mod_probs is None:
            continue
        for mod_prob, mod_base in zip(mod_probs, mod_bases):
            per_mod[mod_base].append((pos, mod_prob))

    mm_tag, ml_tag = "", array.array("B")
    # rank of each position among same-canonical-base positions
    can_base_ranks = None
    for mod_base, pos_probs in per_mod.items():
        if len(pos_probs) == 0:
            continue
        mod_poss, mprobs = zip(*sorted(pos_probs))
        if can_base_ranks is None:
            can_base_ranks = np.cumsum(
                np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
                == ord(can_base)
            )
        ranks = can_base_ranks[np.array(mod_poss)] - 1
        gaps = ",".join(map(str, np.diff(np.insert(ranks, 0, -1)) - 1))
        mm_tag += f"{can_base}{strand}{mod_base}?,{gaps};"
        scaled = np.floor(np.array(mprobs) * 256)
        scaled[scaled == 256] = 255
        ml_tag.extend(scaled.astype(np.uint8))
    return mm_tag, ml_tag


def mods_tags_to_str(mm_tags, ml_arr):
    """Render MM/ML tag values as SAM text fields."""
    return [
        f"MM:Z:{''.join(mm_tags)}",
        f"ML:B:C,{','.join(map(str, ml_arr))}",
    ]
