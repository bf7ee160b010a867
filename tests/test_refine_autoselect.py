"""Device-aware 'auto' refine-backend resolution (refine/autoselect)."""

import numpy as np
import pytest

from remora_tpu.constants import (
    REFINE_BACKEND_AUTO,
    REFINE_BACKEND_DEVICE,
    REFINE_BACKEND_NATIVE,
)
from remora_tpu.refine.autoselect import (
    probe_device_roundtrip,
    resolve_auto_backend,
)
from remora_tpu.refine.refiner import SigMapRefiner


@pytest.fixture
def refining_smr():
    levels = {
        "".join(k): float(i)
        for i, k in enumerate(
            __import__("itertools").product("ACGT", repeat=3)
        )
    }
    return SigMapRefiner.load_from_dict(levels, scale_iters=1)


def test_device_when_link_fast(refining_smr):
    assert (
        resolve_auto_backend(refining_smr, probe=lambda: 0.003)
        == REFINE_BACKEND_DEVICE
    )


def test_host_when_link_slow(refining_smr):
    assert (
        resolve_auto_backend(refining_smr, probe=lambda: 0.5)
        == REFINE_BACKEND_AUTO
    )


def test_host_when_no_accelerator(refining_smr):
    assert (
        resolve_auto_backend(refining_smr, probe=lambda: None)
        == REFINE_BACKEND_AUTO
    )


def test_no_probe_when_nothing_refines():
    def boom():
        raise AssertionError("probe must not run")

    # unloaded refiner / None / explicit non-auto backend: no probe
    assert resolve_auto_backend(SigMapRefiner(), probe=boom) == (
        REFINE_BACKEND_AUTO
    )
    assert resolve_auto_backend([None], probe=boom) == REFINE_BACKEND_AUTO
    assert resolve_auto_backend(None, probe=boom) == REFINE_BACKEND_AUTO


def test_no_probe_for_non_auto_refiner(refining_smr):
    def boom():
        raise AssertionError("probe must not run")

    refining_smr.backend = REFINE_BACKEND_NATIVE
    assert resolve_auto_backend(refining_smr, probe=boom) == (
        REFINE_BACKEND_AUTO
    )


def test_env_force_overrides_probe(refining_smr, monkeypatch):
    def boom():
        raise AssertionError("probe must not run")

    monkeypatch.setenv("REMORA_TPU_REFINE_AUTO", "device")
    assert resolve_auto_backend(refining_smr, probe=boom) == (
        REFINE_BACKEND_DEVICE
    )
    monkeypatch.setenv("REMORA_TPU_REFINE_AUTO", "native")
    assert resolve_auto_backend(refining_smr, probe=boom) == (
        REFINE_BACKEND_NATIVE
    )


def test_threshold_env(refining_smr, monkeypatch):
    monkeypatch.setenv("REMORA_TPU_REFINE_PROBE_THRESHOLD", "0.001")
    assert (
        resolve_auto_backend(refining_smr, probe=lambda: 0.003)
        == REFINE_BACKEND_AUTO
    )


def test_probe_short_circuits_on_cpu_platform(monkeypatch):
    """Under JAX_PLATFORMS=cpu (the test env) the probe returns None
    without spawning a subprocess."""
    import remora_tpu.refine.autoselect as A

    monkeypatch.setattr(A, "_probe_cache", {})
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def no_subprocess(*a, **k):
        raise AssertionError("must not spawn a probe subprocess")

    monkeypatch.setattr(A.subprocess, "run", no_subprocess)
    assert probe_device_roundtrip() is None


def test_inprocess_probe_returns_none_on_cpu(monkeypatch):
    """The in-process probe (used by drivers already holding a JAX
    client — a subprocess probe there would open a second client, which
    fails under libtpu's exclusive lock and can wedge tunnels) returns
    None on the CPU backend."""
    import remora_tpu.refine.autoselect as A

    monkeypatch.setattr(A, "_probe_cache", {})
    assert A.probe_device_roundtrip_inprocess() is None


def test_infer_resolves_auto_without_probe_for_unloaded_refiners(
    tmpdir_factory, trained_model, monkeypatch
):
    """End-to-end: infer with refine_backend=None on models whose
    refiners are unloaded must not probe and must stay on the host
    pipeline shape."""
    import remora_tpu.refine.autoselect as A
    from remora_tpu.infer.infer import ModelHandle, infer_from_pod5_and_bam

    def boom(*a, **k):
        raise AssertionError("probe must not run")

    monkeypatch.setattr(A, "probe_device_roundtrip", boom)
    monkeypatch.setattr(A, "probe_device_roundtrip_inprocess", boom)
    out = tmpdir_factory.mktemp("auto_infer") / "out.bam"
    n = infer_from_pod5_and_bam(
        pod5_path="/root/reference/tests/data/can_reads.pod5",
        in_bam_path="/root/reference/tests/data/can_mappings.bam",
        models=[ModelHandle.load(trained_model)],
        out_bam_path=str(out),
        batch_size=128,
    )
    assert n == 14
