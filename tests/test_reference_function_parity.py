"""Fuzz parity against exec-loaded REFERENCE functions.

Extracts individual top-level functions from the reference sources by
AST (so uncompilable module-level imports — Cython extensions, polars,
pysam — never run) and fuzzes the repo's implementations against them
for exact equality:

  * MM/ML tag formatter  — /root/reference/src/remora/util.py:485–534
  * band construction    — refine_signal_map.py:634–776
  * rough/precise rescale estimators — refine_signal_map.py:68–140

This closes the self-referential gap of round-trip tests where both
sides are repo-authored.
"""

import ast
import array as array_module

import numpy as np
import pytest

from remora_tpu import RemoraError

REF_UTIL = "/root/reference/src/remora/util.py"
REF_REFINE = "/root/reference/src/remora/refine_signal_map.py"


class _SilentLogger:
    def __getattr__(self, name):
        return lambda *a, **k: None


def load_ref_functions(path, names):
    """Exec only the named top-level function defs from a reference file."""
    with open(path) as fh:
        tree = ast.parse(fh.read())
    found = {
        node.name: node
        for node in tree.body
        if isinstance(node, ast.FunctionDef) and node.name in names
    }
    missing = set(names) - set(found)
    assert not missing, f"reference functions not found: {missing}"
    mod = ast.Module(body=[found[n] for n in names], type_ignores=[])
    ns = {
        "np": np,
        "array": array_module,
        "RemoraError": RemoraError,
        "LOGGER": _SilentLogger(),
        "DEFAULT_REFINE_HBW": 5,
        "MAX_POINTS_FOR_THEIL_SEN": 1000,
    }
    exec(compile(mod, path, "exec"), ns)
    return {n: ns[n] for n in names}


# --- MM/ML tag formatter -------------------------------------------------

REF_TAGS = load_ref_functions(REF_UTIL, ["format_mm_ml_tags"])


def _random_mod_call_case(rng):
    n = int(rng.integers(20, 200))
    seq = "".join(rng.choice(list("ACGT"), n))
    can_base = str(rng.choice(list("ACGT")))
    n_mods = int(rng.integers(1, 3))
    mod_bases = ["m", "h"][:n_mods]
    focus = [i for i, b in enumerate(seq) if b == can_base]
    if not focus:
        return None
    k = int(rng.integers(1, len(focus) + 1))
    poss = list(rng.choice(focus, size=k, replace=False))
    probs = [
        None if rng.random() < 0.1 else rng.random(n_mods)
        for _ in range(k)
    ]
    strand = "+" if rng.random() < 0.8 else "-"
    return seq, poss, probs, mod_bases, can_base, strand


def test_format_mm_ml_tags_fuzz_vs_reference():
    from remora_tpu.core.tags import format_mm_ml_tags

    rng = np.random.default_rng(0)
    checked = 0
    while checked < 120:
        case = _random_mod_call_case(rng)
        if case is None:
            continue
        ref_mm, ref_ml = REF_TAGS["format_mm_ml_tags"](*case)
        got_mm, got_ml = format_mm_ml_tags(*case)
        assert got_mm == ref_mm, case
        assert list(got_ml) == list(ref_ml), case
        checked += 1


def test_format_mm_ml_tags_prob_boundaries_vs_reference():
    """floor(p*256) scaling incl. the p=1.0 -> 255 clamp."""
    from remora_tpu.core.tags import format_mm_ml_tags

    seq = "CCCCC"
    poss = [0, 1, 2, 3, 4]
    probs = [
        np.array([p]) for p in (0.0, 1.0, 255 / 256, 0.5, 0.999999)
    ]
    case = (seq, poss, probs, ["m"], "C", "+")
    ref_mm, ref_ml = REF_TAGS["format_mm_ml_tags"](*case)
    got_mm, got_ml = format_mm_ml_tags(*case)
    assert got_mm == ref_mm
    assert list(got_ml) == list(ref_ml)


# --- band construction ---------------------------------------------------

REF_BAND = load_ref_functions(
    REF_REFINE, ["compute_sig_band", "convert_to_seq_band", "validate_band"]
)


def _random_band_inputs(rng):
    seq_len = int(rng.integers(5, 120))
    dwells = rng.integers(1, 15, seq_len)
    bps = np.concatenate([[0], np.cumsum(dwells)]).astype(np.int32)
    levels = rng.normal(size=seq_len)
    # sprinkle NaNs (un-scored bases pin the band)
    nan_mask = rng.random(seq_len) < 0.07
    levels[nan_mask] = np.nan
    bhw = int(rng.integers(1, 10))
    return bps, levels, bhw


@pytest.mark.parametrize("is_banded", [True, False])
def test_band_construction_fuzz_vs_reference(is_banded):
    from remora_tpu.refine.band import compute_sig_band, convert_to_seq_band

    rng = np.random.default_rng(7)
    for _ in range(100):
        bps, levels, bhw = _random_band_inputs(rng)
        ref_sig = REF_BAND["compute_sig_band"](
            bps, levels, bhw=bhw, is_banded=is_banded
        )
        got_sig = compute_sig_band(bps, levels, bhw=bhw, is_banded=is_banded)
        assert np.array_equal(got_sig, ref_sig)
        ref_seq = REF_BAND["convert_to_seq_band"](ref_sig)
        got_seq = convert_to_seq_band(got_sig)
        assert np.array_equal(got_seq, ref_seq)


def test_validate_band_fuzz_vs_reference():
    """Accept/reject decisions match the reference validator."""
    from remora_tpu.refine.band import compute_sig_band, validate_band

    rng = np.random.default_rng(9)
    for _ in range(60):
        bps, levels, bhw = _random_band_inputs(rng)
        band = compute_sig_band(bps, levels, bhw=bhw)
        # random corruption half the time
        if rng.random() < 0.5:
            mode = rng.integers(0, 3)
            if mode == 0:
                band[0, 0] = 1
            elif mode == 1:
                col = int(rng.integers(0, band.shape[1]))
                band[1, col] = band[0, col]
            else:
                col = int(rng.integers(1, band.shape[1]))
                band[0, col] = max(0, band[0, col - 1] - 1)
                band[0] = np.minimum(band[0], band[1] - 1)
        kwargs = dict(
            sig_len=int(bps[-1] - bps[0]), seq_len=levels.size,
            is_sig_band=True,
        )
        ref_err = got_err = None
        try:
            REF_BAND["validate_band"](band, **kwargs)
        except RemoraError as e:
            ref_err = str(e)
        try:
            validate_band(band, **kwargs)
        except RemoraError as e:
            got_err = str(e)
        assert (ref_err is None) == (got_err is None), (ref_err, got_err)


# --- rescale estimators --------------------------------------------------

REF_RESCALE = load_ref_functions(
    REF_REFINE,
    [
        "rough_rescale_lstsq",
        "compute_slopes",
        "theil_sen",
        "rescale_theil_sen",
        "rough_rescale_theil_sen",
    ],
)
# theil_sen helpers call each other through the exec namespace; rebind
for fn in ("theil_sen", "rescale_theil_sen", "rough_rescale_theil_sen"):
    REF_RESCALE[fn].__globals__.update(REF_RESCALE)


def _random_rescale_inputs(rng, n=None):
    n = n or int(rng.integers(30, 400))
    levels = rng.normal(size=n)
    shift = float(rng.normal(100, 10))
    scale = float(rng.normal(20, 2))
    dacs = levels * scale * rng.normal(1.0, 0.05) + shift + rng.normal(
        0, 0.5, n
    )
    return dacs, levels, shift, scale


def test_rough_rescale_lstsq_fuzz_vs_reference():
    from remora_tpu.refine.rescale import quantile_lstsq_rescale

    rng = np.random.default_rng(3)
    quants = np.arange(0.05, 1, 0.05)
    for _ in range(100):
        dacs, levels, shift, scale = _random_rescale_inputs(rng)
        ref = REF_RESCALE["rough_rescale_lstsq"](
            dacs, levels, shift, scale, quants
        )
        got = quantile_lstsq_rescale(dacs, levels, shift, scale, quants)
        assert got == ref


def test_rough_rescale_theil_sen_fuzz_vs_reference():
    from remora_tpu.refine.rescale import quantile_theil_sen_rescale

    rng = np.random.default_rng(4)
    quants = np.arange(0.05, 1, 0.05)
    for _ in range(100):
        dacs, levels, shift, scale = _random_rescale_inputs(rng)
        ref = REF_RESCALE["rough_rescale_theil_sen"](
            dacs, levels, shift, scale, quants
        )
        got = quantile_theil_sen_rescale(dacs, levels, shift, scale, quants)
        assert got == ref


def test_point_theil_sen_fuzz_vs_reference():
    """Precise (per-point) Theil–Sen, below the RNG subsample limit."""
    from remora_tpu.refine.rescale import point_theil_sen_rescale

    rng = np.random.default_rng(5)
    for _ in range(60):
        dacs, levels, shift, scale = _random_rescale_inputs(
            rng, n=int(rng.integers(30, 900))
        )
        ref = REF_RESCALE["rescale_theil_sen"](dacs, levels, shift, scale)
        got = point_theil_sen_rescale(dacs, levels, shift, scale)
        assert got == ref


def test_point_theil_sen_subsample_rng_vs_reference():
    """Above MAX_POINTS_FOR_THEIL_SEN both sides subsample via the global
    NumPy RNG with identical call sequences — seeded, they must agree."""
    from remora_tpu.refine.rescale import point_theil_sen_rescale

    rng = np.random.default_rng(6)
    dacs, levels, shift, scale = _random_rescale_inputs(rng, n=1500)
    np.random.seed(1234)
    ref = REF_RESCALE["rescale_theil_sen"](dacs, levels, shift, scale)
    np.random.seed(1234)
    got = point_theil_sen_rescale(dacs, levels, shift, scale)
    assert got == ref
