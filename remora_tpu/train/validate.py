"""Validation metrics + TSV logger.

Reference analog ``src/remora/validate.py:42–288``: accuracy, confusion
matrix, quantile-threshold filtered accuracy; unmodeled-label padding so
a model can be validated on datasets with extra mod classes.
"""

import json
from collections import namedtuple

import numpy as np

from remora_tpu import constants, log
from remora_tpu.core.tags import softmax

LOGGER = log.get_logger()

VAL_METRICS = namedtuple(
    "VAL_METRICS",
    (
        "loss",
        "acc",
        "num_calls",
        "conf_mat",
        "filt_frac",
        "filt_acc",
        "filt_conf_mat",
        "filt_thresh",
    ),
)


def mat_to_str(mat):
    return json.dumps(np.asarray(mat).tolist(), separators=(",", ":"))


def confusion_matrix(labels, preds, num_classes=None):
    if num_classes is None:
        num_classes = int(max(labels.max(), preds.max())) + 1
    mat = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(mat, (labels, preds), 1)
    # match sklearn: drop classes absent from both labels and preds
    present = np.union1d(np.unique(labels), np.unique(preds))
    return mat[np.ix_(present, present)]


def compute_metrics(probs, labels, filt_frac):
    pred_labels = np.argmax(probs, axis=1)
    conf_mat = confusion_matrix(labels, pred_labels)
    correctly_labeled = pred_labels == labels
    acc = correctly_labeled.sum() / labels.size

    pred_probs = np.take_along_axis(
        probs, np.expand_dims(pred_labels, -1), -1
    ).squeeze(-1)
    filt_thr = np.quantile(pred_probs, filt_frac)
    if filt_thr == pred_probs.max():
        filt_thr *= 0.999999
    conf_chunks = pred_probs > filt_thr
    filt_labels = labels[conf_chunks]
    if filt_labels.size == 0:
        return acc, conf_mat, 1.0, np.nan, np.array([]), np.nan
    filt_acc = correctly_labeled[conf_chunks].sum() / filt_labels.size
    filt_conf_mat = confusion_matrix(filt_labels, pred_labels[conf_chunks])
    filt_frac = 1 - (filt_labels.size / labels.size)
    return acc, conf_mat, filt_frac, filt_acc, filt_conf_mat, filt_thr


def add_unmodeled_labels(output, unmodeled_labels):
    """Insert -1000 logit columns for labels the model does not predict."""
    if unmodeled_labels.size == 0:
        return output
    nobs, nlab = output.shape
    n_new_lab = nlab + unmodeled_labels.size
    new_output = np.full((nobs, n_new_lab), -1000, dtype=output.dtype)
    new_output[:, 0] = output[:, 0]
    unused_idx = 0
    for idx in range(1, n_new_lab):
        if idx in unmodeled_labels:
            unused_idx += 1
            continue
        new_output[:, idx] = output[:, idx - unused_idx]
    return new_output


def cross_entropy(logits, labels):
    logp = logits - np.log(np.exp(logits - logits.max(axis=1, keepdims=True))
                           .sum(axis=1, keepdims=True)) - logits.max(
        axis=1, keepdims=True
    )
    return float(-np.mean(np.take_along_axis(logp, labels[:, None], 1)))


def process_mods_probs(probs, labels, allow_unbalanced, pct_filt, name,
                       fp=None):
    """Balance classes (optionally) and report metrics for modBAM validation."""
    from remora_tpu import RemoraError

    if not allow_unbalanced:
        nlabs = max(labels.max() + 1, probs.shape[1])
        labels_probs = [probs[labels == i] for i in range(nlabs)]
        lab_sizes = [lp.shape[0] for lp in labels_probs]
        if len(lab_sizes) == 1:
            raise RemoraError(
                "Cannot balance dataset with 1 label. "
                "Consider running with `--allow-unbalanced`"
            )
        LOGGER.debug(f"Balancing labels. Starting from: {lab_sizes}")
        min_size = min(s for s in lab_sizes if s > 0)
        bal_probs, bal_labels = [], []
        for lab_idx, label_probs in enumerate(labels_probs):
            if label_probs.shape[0] == 0:
                continue
            if label_probs.shape[0] > min_size:
                np.random.shuffle(label_probs)
            bal_probs.append(label_probs[:min_size])
            bal_labels.append(np.full(min_size, lab_idx, dtype=labels.dtype))
        probs = np.concatenate(bal_probs)
        labels = np.concatenate(bal_labels)

    acc, conf_mat, filt_frac, filt_acc, filt_conf_mat, filt_thr = (
        compute_metrics(probs, labels, pct_filt / 100)
    )
    ms = VAL_METRICS(
        loss=np.nan,
        acc=acc,
        num_calls=labels.size,
        conf_mat=conf_mat,
        filt_frac=filt_frac,
        filt_acc=filt_acc,
        filt_conf_mat=filt_conf_mat,
        filt_thresh=filt_thr,
    )
    val_output = (
        f"\n{ValidationLogger.HEADER}\n"
        f"{name}\t0\t0\t"
        f"{ms.acc:.6f}\t{mat_to_str(ms.conf_mat)}\t"
        f"NAN\t{ms.num_calls}\t{ms.filt_frac:.4f}\t"
        f"{ms.filt_acc:.6f}\t{mat_to_str(ms.filt_conf_mat)}\t{ms.filt_thresh}\n"
    )
    LOGGER.info(val_output)
    if fp is not None:
        fp.write(
            f"{name}\t0\t0\t{ms.acc:.6f}\t{mat_to_str(ms.conf_mat)}\tNAN\t"
            f"{ms.num_calls}\t{ms.filt_frac:.4f}\t{ms.filt_acc:.6f}\t"
            f"{mat_to_str(ms.filt_conf_mat)}\t{ms.filt_thresh}\n"
        )
    return ms


class ValidationLogger:
    HEADER = "\t".join(
        (
            "Val_Type",
            "Epoch",
            "Iteration",
            "Accuracy",
            "Confusion_Matrix",
            "Loss",
            "Num_Calls",
            "Filtered_Fraction",
            "Filtered_Accuracy",
            "Filtered_Confusion_Matrix",
            "Filtered_Threshold",
        )
    )
    FULL_HEADER = "\t".join(["label", "class_pred", "class_probs"])

    def __init__(self, fp, full_results_fh=None):
        self.fp = fp
        self.fp.write(self.HEADER + "\n")
        self.full_fh = full_results_fh
        if self.full_fh is not None:
            self.full_fh.write(self.FULL_HEADER + "\n")

    def write_full_results(self, output, labels):
        for lab, pred, probs in zip(
            labels.tolist(), output.argmax(axis=1), softmax(output)
        ):
            self.fp_row = None
            self.full_fh.write(
                f"{lab}\t{pred}\t{','.join(map(str, probs))}\n"
            )

    def run_validation(self, eval_fn, model_mod_bases, dataset,
                       filt_frac=constants.DEFAULT_FILT_FRAC):
        """eval_fn(sigs, enc_kmers) -> logits (numpy)."""
        unmodeled_labels = np.array(
            [
                idx + 1
                for idx, mb in enumerate(dataset.metadata.mod_bases)
                if mb not in model_mod_bases
            ]
        )
        all_labels, all_outputs, all_loss = [], [], []
        for batch in dataset:
            labels = np.asarray(batch["labels"])
            all_labels.append(labels)
            output = np.asarray(eval_fn(batch["signal"], batch["enc_kmers"]))
            output = add_unmodeled_labels(output, unmodeled_labels)
            all_outputs.append(output)
            all_loss.append(cross_entropy(output, labels))
            if self.full_fh is not None:
                self.write_full_results(output, labels)
        all_outputs = np.concatenate(all_outputs, axis=0)
        all_labels = np.concatenate(all_labels)
        all_probs = softmax(all_outputs)
        acc, conf_mat, out_filt_frac, filt_acc, filt_conf_mat, filt_thr = (
            compute_metrics(all_probs, all_labels, filt_frac)
        )
        return VAL_METRICS(
            loss=float(np.mean(all_loss)),
            acc=acc,
            num_calls=all_labels.size,
            conf_mat=conf_mat,
            filt_frac=out_filt_frac,
            filt_acc=filt_acc,
            filt_conf_mat=filt_conf_mat,
            filt_thresh=filt_thr,
        )

    def validate_model(self, eval_fn, model_mod_bases, dataset,
                       filt_frac=constants.DEFAULT_FILT_FRAC, val_type="val",
                       nepoch=0, niter=0):
        ms = self.run_validation(eval_fn, model_mod_bases, dataset, filt_frac)
        self.fp.write(
            f"{val_type}\t{nepoch}\t{niter}\t"
            f"{ms.acc:.6f}\t{mat_to_str(ms.conf_mat)}\t"
            f"{ms.loss:.6f}\t{ms.num_calls}\t{ms.filt_frac:.4f}\t"
            f"{ms.filt_acc:.6f}\t{mat_to_str(ms.filt_conf_mat)}\t"
            f"{ms.filt_thresh}\n"
        )
        return ms
