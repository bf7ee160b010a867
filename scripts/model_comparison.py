"""Compare validation metrics of several models on one dataset.

Reference analog ``scripts/model_comparison.py``.
"""

import argparse
import io
import sys

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", help="dataset dir or config")
    parser.add_argument("--models", nargs="+", required=True)
    parser.add_argument("--batch-size", type=int, default=512)
    args = parser.parse_args()

    from remora_tpu.data.dataset import (
        ComposedDataset,
        CoreDataset,
        load_dataset,
    )
    from remora_tpu.infer.infer import make_model_eval_fn
    from remora_tpu.models import model_io
    from remora_tpu.train.validate import ValidationLogger

    print("model\tacc\tfilt_acc\tnum_calls")
    for path in args.models:
        model, params, bn_state, meta = model_io.load_model(path)
        paths, props, hashes = load_dataset(args.dataset)
        ds = ComposedDataset(
            [
                CoreDataset(
                    p,
                    override_metadata={
                        "extra_arrays": {},
                        "chunk_context": list(meta["chunk_context"]),
                        "kmer_context_bases": list(
                            meta["kmer_context_bases"]
                        ),
                    },
                    infinite_iter=False,
                )
                for p in paths
            ],
            props,
            hashes,
            batch_size=args.batch_size,
        )
        fwd = make_model_eval_fn(model, params, bn_state)

        def eval_fn(sigs, enc_kmers):
            n = sigs.shape[0]
            if n < args.batch_size:
                ps = np.zeros((args.batch_size,) + sigs.shape[1:], sigs.dtype)
                pk = np.zeros(
                    (args.batch_size,) + enc_kmers.shape[1:], enc_kmers.dtype
                )
                ps[:n] = sigs
                pk[:n] = enc_kmers
                return np.asarray(fwd(ps, pk))[:n]
            return np.asarray(fwd(sigs, enc_kmers))

        logger = ValidationLogger(io.StringIO())
        ms = logger.run_validation(eval_fn, meta["mod_bases"], ds, 0.1)
        print(f"{path}\t{ms.acc:.6f}\t{ms.filt_acc:.6f}\t{ms.num_calls}")


if __name__ == "__main__":
    main()
