"""Plot training logs (reference analog ``scripts/plot_results.py``)."""

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("train_dir", help="training output directory")
    parser.add_argument("--out-path", default=None)
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    batch_log = os.path.join(args.train_dir, "batch.log")
    val_log = os.path.join(args.train_dir, "validation.log")

    fig, axes = plt.subplots(3, 1, figsize=(10, 10), sharex=False)
    # batch loss
    iters, losses = [], []
    with open(batch_log) as fh:
        next(fh)
        for line in fh:
            fields = line.split("\t")
            iters.append(int(fields[0]))
            losses.append(float(fields[1]))
    axes[0].plot(iters, losses, lw=0.5)
    axes[0].set_ylabel("Batch loss")
    axes[0].set_xlabel("Iteration")

    # validation acc/loss per type
    vals = {}
    with open(val_log) as fh:
        header = next(fh).rstrip().split("\t")
        for line in fh:
            fields = dict(zip(header, line.rstrip().split("\t")))
            vals.setdefault(fields["Val_Type"], []).append(
                (
                    int(fields["Iteration"]),
                    float(fields["Accuracy"]),
                    float(fields["Loss"]),
                )
            )
    for vtype, rows in vals.items():
        rows.sort()
        its = [r[0] for r in rows]
        axes[1].plot(its, [r[1] for r in rows], marker="o", label=vtype)
        axes[2].plot(its, [r[2] for r in rows], marker="o", label=vtype)
    axes[1].set_ylabel("Validation accuracy")
    axes[2].set_ylabel("Validation loss")
    axes[2].set_xlabel("Iteration")
    axes[1].legend()
    fig.tight_layout()
    out = args.out_path or os.path.join(args.train_dir, "training_curves.png")
    fig.savefig(out)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
