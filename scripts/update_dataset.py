"""Migrate a legacy (<v3) npz chunk dataset to the v3 on-disk format.

Reference analog ``scripts/update_dataset.py``.
"""

import argparse

import numpy as np

from remora_tpu.data.dataset import CoreDataset
from remora_tpu.data.metadata import DatasetMetadata


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("in_npz", help="legacy remora_train_data.npz")
    parser.add_argument("out_dataset", help="output v3 dataset directory")
    args = parser.parse_args()

    data = np.load(args.in_npz, allow_pickle=True)
    sigs = data["sigs"] if "sigs" in data else data["signal"]
    seqs = data["seqs"] if "seqs" in data else data["sequence"]
    seq_maps = (
        data["seq_mappings"]
        if "seq_mappings" in data
        else data["sequence_to_signal_mapping"]
    )
    seq_lens = (
        data["seq_lens"] if "seq_lens" in data else data["sequence_lengths"]
    )
    labels = data["labels"]
    if sigs.ndim == 2:
        sigs = sigs[:, None, :]
    n = sigs.shape[0]
    mod_bases = [str(b) for b in data.get("mod_bases", [])]
    mod_long_names = [str(b) for b in data.get("mod_long_names", mod_bases)]
    # legacy files carry either a (seq, offset) pair list ("motifs") or
    # split sequence/offset arrays; v3 metadata validates that focus
    # bases are unambiguous, so there is no meaningful default
    if "motifs" in data:
        motifs = [(str(m[0]), int(m[1])) for m in data["motifs"]]
    elif "motif_sequences" in data and "motif_offsets" in data:
        motifs = list(
            zip(
                (str(s) for s in data["motif_sequences"]),
                (int(o) for o in data["motif_offsets"]),
            )
        )
    elif "motif" in data:
        m = data["motif"]
        motifs = [(str(m[0]), int(m[1]))]
    else:
        raise SystemExit(
            "legacy npz carries no motif metadata (motifs / "
            "motif_sequences+motif_offsets / motif); the v3 format "
            "requires motifs with unambiguous focus bases"
        )
    md = DatasetMetadata(
        allocate_size=n,
        max_seq_len=int(seq_maps.shape[1] - 1),
        mod_bases=mod_bases,
        mod_long_names=mod_long_names,
        motif_sequences=[str(m[0]) for m in motifs],
        motif_offsets=[int(m[1]) for m in motifs],
        chunk_context=tuple(
            int(x) for x in data.get("chunk_context", (200, 200))
        ),
        kmer_context_bases=tuple(
            int(x) for x in data.get("kmer_context_bases", (4, 4))
        ),
    )
    ds = CoreDataset(data_path=args.out_dataset, mode="w", metadata=md)
    ds.write_batch(
        {
            "signal": sigs.astype(np.float32),
            "sequence": seqs.astype(np.int8),
            "sequence_to_signal_mapping": seq_maps.astype(np.int16),
            "sequence_lengths": seq_lens.astype(np.int16),
            "labels": labels.astype(np.int64),
        }
    )
    ds.write_metadata()
    ds.flush()
    print(f"Migrated {n} chunks -> {args.out_dataset}")


if __name__ == "__main__":
    main()
