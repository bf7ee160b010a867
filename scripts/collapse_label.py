"""Remove one modified base from MM/ML tags with renormalization.

Reference analog ``scripts/collapse_label.py`` (pysam version) built on
the native BAM codec.
"""

import argparse
from collections import defaultdict

import numpy as np

from remora_tpu.core.tags import format_mm_ml_tags
from remora_tpu.io.bam import BamWriter, FastBamScanner


def collapse_read(read, alphabet, valid_indices, new_alphabet):
    mb = read.modified_bases
    if read.is_secondary or read.is_supplementary or mb is None:
        return None
    # work in original read orientation
    q_mod_probs = defaultdict(dict)
    for (_cb, _mod_strand, mod_name), mod_values in mb.items():
        for pos, prob in mod_values:
            orig_pos = (
                pos
                if not read.is_reverse
                else len(read.query_sequence) - 1 - pos
            )
            q_mod_probs[orig_pos][mod_name] = (prob + 0.5) / 256
    if not q_mod_probs:
        return None
    collapsed = {}
    for q_pos, pos_probs in q_mod_probs.items():
        arr = np.array(
            [1 - sum(pos_probs.values())]
            + [pos_probs.get(mn, 0) for mn in alphabet[1:]]
        )
        collapsed[q_pos] = (arr[valid_indices] / arr[valid_indices].sum())[1:]
    poss = sorted(collapsed)
    probs = [collapsed[p] for p in poss]
    if read.is_reverse:
        from remora_tpu.core.seq import revcomp

        seq = revcomp(read.query_sequence)
    else:
        seq = read.query_sequence
    return format_mm_ml_tags(
        seq, poss, probs, new_alphabet[1:], new_alphabet[0]
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("in_bam")
    parser.add_argument("out_bam")
    parser.add_argument(
        "--alphabet", required=True,
        help="canonical base followed by mod codes as in the input, e.g. Chm",
    )
    parser.add_argument(
        "--drop-mod", required=True, help="mod code to remove, e.g. h"
    )
    args = parser.parse_args()

    alphabet = list(args.alphabet)
    new_alphabet = [b for b in alphabet if b != args.drop_mod]
    valid_indices = np.array(
        [i for i, b in enumerate(alphabet) if b != args.drop_mod]
    )
    scanner = FastBamScanner(args.in_bam)
    n = 0
    with BamWriter(args.out_bam, scanner.header) as out:
        for read in scanner:
            tags = collapse_read(read, alphabet, valid_indices, new_alphabet)
            if tags is not None:
                mm, ml = tags
                read.set_tag("MM", "Z", mm)
                read.set_tag(
                    "ML", "BC", np.frombuffer(ml.tobytes(), dtype=np.uint8)
                )
            out.write(read)
            n += 1
    print(f"Wrote {n} records to {args.out_bam}")


if __name__ == "__main__":
    main()
