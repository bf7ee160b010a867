"""Signal plotting at reference regions (matplotlib backend).

Reference analog: the plotnine plots in ``src/remora/io.py:1052–1738``
(`plot_signal_at_ref_region` and per-read signal plots) and the
``analyze plot ref_region`` CLI (``parsers.py:1971–2145``).
"""

import numpy as np

from remora_tpu import RemoraError, log
from remora_tpu.analyze.regions import (
    RegionIndexedBam,
    get_reads_reference_regions,
    get_ref_seq_and_levels_from_reads,
)
from remora_tpu.io.pod5 import DatasetReader
from remora_tpu.io.refregion import RefRegion, parse_bed

LOGGER = log.get_logger()

BASE_COLORS = {
    "A": "#00CC00",
    "C": "#0000CC",
    "G": "#FFB300",
    "T": "#CC0000",
    "U": "#CC0000",
    "N": "#FFFFFF",
}
SAMPLE_COLORS = ["#1f77b4", "#d62728", "#2ca02c", "#9467bd", "#8c564b"]


def compute_base_space_sig_coords(seq_to_sig_map):
    """Interpolate signal-point coordinates into base space."""
    return np.interp(
        np.arange(seq_to_sig_map[-1] - seq_to_sig_map[0]),
        seq_to_sig_map,
        np.arange(seq_to_sig_map.size),
    )


def plot_signal_at_ref_region(
    pod5_and_bams,
    ref_reg_str,
    out_path,
    sig_map_refiner=None,
    max_reads=50,
    highlight_positions=None,
    levels_table=None,
    figsize=(18, 5),
):
    """Overlay per-read signal from one or more samples at a region.

    Args:
        pod5_and_bams: list of (pod5_path, bam_path) pairs (samples)
        ref_reg_str: e.g. "chr1:100-200:+"
        out_path: figure path (svg/png/pdf by extension)
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ref_reg = RefRegion.parse_ref_region_str(ref_reg_str)
    pairs = [
        (DatasetReader(pod5_path), RegionIndexedBam(bam_path))
        for pod5_path, bam_path in pod5_and_bams
    ]
    samples_regs, all_bam_reads = get_reads_reference_regions(
        ref_reg,
        pairs,
        sig_map_refiner=sig_map_refiner,
        max_reads=max_reads,
    )
    seq, levels = get_ref_seq_and_levels_from_reads(
        ref_reg, [r for br in all_bam_reads for r in br], sig_map_refiner
    )

    fig, ax = plt.subplots(figsize=figsize)
    for samp_i, sample_regs in enumerate(samples_regs):
        color = SAMPLE_COLORS[samp_i % len(SAMPLE_COLORS)]
        for read_reg in sample_regs:
            coords = (
                compute_base_space_sig_coords(read_reg.seq_to_sig_map)
                + ref_reg.start
            )
            ax.plot(
                coords,
                read_reg.norm_signal,
                color=color,
                alpha=0.25,
                lw=0.7,
            )
    # base backgrounds
    for pos, base in zip(range(ref_reg.start, ref_reg.end), seq):
        ax.axvspan(
            pos,
            pos + 1,
            color=BASE_COLORS.get(base, "#FFFFFF"),
            alpha=0.08,
        )
        ax.text(
            pos + 0.5,
            ax.get_ylim()[0],
            base,
            ha="center",
            va="bottom",
            fontsize=7,
            color=BASE_COLORS.get(base, "#000000"),
        )
    if levels is not None and np.isfinite(levels).any():
        for pos, level in zip(range(ref_reg.start, ref_reg.end), levels):
            if np.isfinite(level):
                ax.hlines(level, pos, pos + 1, colors="black", lw=1.5)
    if highlight_positions is not None:
        hl = parse_bed(highlight_positions)
        for pos in hl.get((ref_reg.ctg, ref_reg.strand), ()):
            if ref_reg.start <= pos < ref_reg.end:
                ax.axvspan(pos, pos + 1, color="yellow", alpha=0.3)
    ax.set_xlim(ref_reg.start, ref_reg.end)
    ax.set_xlabel(f"{ref_reg.ctg} ({ref_reg.strand})")
    ax.set_ylabel("Normalized signal")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    LOGGER.info(f"Region plot written to {out_path}")
    return out_path


def plot_on_signal_coords(seq, norm_signal, seq_to_sig_map, out_path=None,
                          rev_strand=False, sig_start=0, figsize=(18, 5)):
    """Single-read signal vs signal coordinates with base spans."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=figsize)
    x = np.arange(norm_signal.size) + sig_start
    ax.plot(x, norm_signal, color="black", lw=0.8)
    for bi, base in enumerate(seq):
        st = seq_to_sig_map[bi] + sig_start
        en = seq_to_sig_map[bi + 1] + sig_start
        ax.axvspan(st, en, color=BASE_COLORS.get(base, "#FFFFFF"), alpha=0.1)
    ax.set_xlabel("Signal position")
    ax.set_ylabel("Normalized signal")
    fig.tight_layout()
    if out_path is not None:
        fig.savefig(out_path)
        plt.close(fig)
        return out_path
    return fig


def plot_on_base_coords(seq, norm_signal, seq_to_sig_map, out_path=None,
                        start_base=0, rev_strand=False,
                        xlab="Base position", figsize=(18, 5)):
    """Single-read signal vs base coordinates."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=figsize)
    coords = compute_base_space_sig_coords(seq_to_sig_map) + start_base
    ax.plot(coords, norm_signal, color="black", lw=0.8)
    for bi, base in enumerate(seq):
        ax.axvspan(
            start_base + bi,
            start_base + bi + 1,
            color=BASE_COLORS.get(base, "#FFFFFF"),
            alpha=0.1,
        )
    ax.set_xlabel(xlab)
    ax.set_ylabel("Normalized signal")
    fig.tight_layout()
    if out_path is not None:
        fig.savefig(out_path)
        plt.close(fig)
        return out_path
    return fig


def plot_ref_region_metrics(samples_metrics, ref_reg, out_path,
                            sample_names=None, figsize=(18, 8)):
    """Boxplots of per-base metrics across samples (metric_boxplots analog)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not samples_metrics:
        raise RemoraError("No metrics to plot")
    metric_names = list(samples_metrics[0].keys())
    fig, axes = plt.subplots(
        len(metric_names), 1, figsize=figsize, sharex=True
    )
    if len(metric_names) == 1:
        axes = [axes]
    positions = np.arange(ref_reg.start, ref_reg.end)
    for ax, mname in zip(axes, metric_names):
        for samp_i, sm in enumerate(samples_metrics):
            vals = sm[mname]
            med = np.nanmedian(vals, axis=0)
            q1 = np.nanpercentile(vals, 25, axis=0)
            q3 = np.nanpercentile(vals, 75, axis=0)
            color = SAMPLE_COLORS[samp_i % len(SAMPLE_COLORS)]
            ax.plot(positions, med, color=color, lw=1.2)
            ax.fill_between(positions, q1, q3, color=color, alpha=0.2)
        ax.set_ylabel(mname)
    axes[-1].set_xlabel(f"{ref_reg.ctg} ({ref_reg.strand})")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
