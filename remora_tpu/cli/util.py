"""CLI-adjacent helpers."""

from pathlib import Path

from remora_tpu import RemoraError


def parse_picoamps(bc_model, sig_map_refiner):
    """Extract pA standardisation factors from a Dorado basecall model dir.

    Reference analog ``util.parse_picoamps`` (``util.py:540–560``); uses
    stdlib tomllib instead of the toml package.
    """
    import tomllib

    if bc_model is None:
        return None
    if sig_map_refiner.do_rough_rescale or sig_map_refiner.scale_iters > -1:
        raise RemoraError(
            "Cannot specify signal scaling/mapping refinement and "
            "picoamp scaling options."
        )
    bc_cfg = Path(bc_model) / "config.toml"
    if not bc_cfg.exists():
        raise RemoraError(f"Basecalling model config does not exist: {bc_cfg}")
    with open(bc_cfg, "rb") as fh:
        cfg = tomllib.load(fh)
    try:
        std_cfg = cfg["standardisation"]
        do_std = std_cfg["standardise"]
        pa_scaling = (std_cfg["mean"], std_cfg["stdev"])
    except KeyError:
        raise RemoraError("Basecalling model is not picoamp scaling model")
    if do_std != 1:
        raise RemoraError("Basecalling model is not picoamp scaling model")
    return pa_scaling
