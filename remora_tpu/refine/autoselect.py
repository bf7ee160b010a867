"""Device-aware resolution of the ``auto`` refine backend.

The ``auto`` banded-DP backend historically always meant "host native
C++ (NumPy fallback)". On a host co-located with its TPU the batched
Pallas DP path is ~5.6x faster than the native core (PERF.md), but over
a tunneled/remote device link the per-batch host<->device transfer
dominates and the host path wins — so the right routing is a MEASURED
property of the link, not a constant. This module probes the link once
per process (in a subprocess, so a wedged remote backend degrades to the
host path instead of hanging the driver) and maps ``auto`` to ``device``
only when the measured round trip is fast enough.

Reference anchor for the DP being routed:
``src/remora/refine_signal_map.py:778`` (the reference has exactly one
backend — its Cython core).
"""

import os
import subprocess
import sys

from remora_tpu import log
from remora_tpu.constants import (
    REFINE_BACKEND_AUTO,
    REFINE_BACKEND_DEVICE,
)

LOGGER = log.get_logger()

# device wins when one ~3MB h2d + small d2h round trip beats this; the
# device-DP batch ships ~3MB of signal per 64-read launch and saves
# ~1.2s of host DP per batch, so co-located links (~5ms round trip)
# clear the bar with a wide margin while tunneled links (hundreds of ms
# to seconds, PERF.md) stay on host
DEFAULT_PROBE_THRESHOLD_S = 0.05

_PROBE_SRC = r"""
import time

import numpy as np

import jax

from remora_tpu.jax_setup import honor_platform_env

honor_platform_env()
if jax.default_backend() == "cpu":
    print("PROBE none")
else:
    dev = jax.devices()[0]
    payload = np.zeros(3 << 18, np.float32)  # 3 MiB
    x = jax.device_put(payload, dev)  # warm: backend init + alloc
    np.asarray(x[:4096])
    t0 = time.perf_counter()
    x = jax.device_put(payload, dev)
    np.asarray(x[:4096])  # d2h leg
    print(f"PROBE {time.perf_counter() - t0:.6f}")
"""

_probe_cache = {}


def probe_device_roundtrip_inprocess():
    """In-process h2d+d2h round-trip seconds, or None on CPU.

    For callers that ALREADY hold a live JAX client (the inference
    driver touches ``jax.devices()`` before resolving the backend): a
    subprocess probe there would initialize a SECOND client against the
    same accelerator — which fails under libtpu's exclusive lock on
    co-located TPU VMs (silently defeating the device routing) and can
    wedge tunneled backends. Since the parent has already committed to
    using the device, timing the round trip on its own client is both
    safe and more representative. Cached per process (shared cache with
    the subprocess probe)."""
    if "t" in _probe_cache:
        return _probe_cache["t"]
    import time

    import jax
    import numpy as np

    result = None
    if jax.default_backend() != "cpu":
        dev = jax.devices()[0]
        payload = np.zeros(3 << 18, np.float32)  # 3 MiB
        x = jax.device_put(payload, dev)  # warm
        np.asarray(x[:4096])
        t0 = time.perf_counter()
        x = jax.device_put(payload, dev)
        np.asarray(x[:4096])  # d2h leg
        result = time.perf_counter() - t0
    _probe_cache["t"] = result
    return result


def probe_device_roundtrip(timeout_s=120.0):
    """Measured h2d+d2h round-trip seconds to the default accelerator,
    or None when there is no accelerator / the probe fails or times out.

    Runs in a subprocess: a wedged tunneled backend hangs even
    ``jax.devices()``, and a refinement driver must never hang on a
    routing decision — use this from drivers that have NOT initialized
    JAX in-process (dataset prepare); drivers already holding a client
    must use ``probe_device_roundtrip_inprocess`` instead (a second
    live client fails or wedges the backend). Cached per process."""
    if "t" in _probe_cache:
        return _probe_cache["t"]
    # cheap short-circuit: an explicit CPU platform request needs no
    # probe (do NOT init jax in-process here — prepare drivers must not
    # grab a device client just to make a routing decision)
    if os.getenv("JAX_PLATFORMS", "").strip().lower() == "cpu":
        _probe_cache["t"] = None
        return None
    result = None
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        for line in (proc.stdout or "").splitlines():
            if line.startswith("PROBE "):
                field = line.split()[1]
                result = None if field == "none" else float(field)
    except (subprocess.TimeoutExpired, ValueError, OSError):
        result = None
    _probe_cache["t"] = result
    return result


def resolve_auto_backend(refiners, probe=None):
    """Concrete backend for ``auto``-backed refiners at pipeline start.

    Returns ``device`` when a refiner will actually run the banded DP
    and the probed link round trip beats the threshold; otherwise
    returns ``auto`` (the host native/NumPy routing, unchanged).

    Overrides: REMORA_TPU_REFINE_AUTO=device|auto|native|numpy pins the
    answer (no probe); REMORA_TPU_REFINE_PROBE_THRESHOLD sets the
    round-trip budget in seconds (default 0.05).
    """
    forced = os.getenv("REMORA_TPU_REFINE_AUTO")
    if forced:
        return forced
    if isinstance(refiners, (list, tuple)):
        refiners = [r for r in refiners if r is not None]
    else:
        refiners = [refiners] if refiners is not None else []
    will_refine = any(
        r.is_loaded and r.scale_iters >= 0
        and r.backend == REFINE_BACKEND_AUTO
        for r in refiners
    )
    if not will_refine:
        return REFINE_BACKEND_AUTO
    if probe is None:
        probe = probe_device_roundtrip  # late-bound (monkeypatchable)
    rt = probe()
    if rt is None:
        return REFINE_BACKEND_AUTO
    threshold = float(
        os.getenv(
            "REMORA_TPU_REFINE_PROBE_THRESHOLD", DEFAULT_PROBE_THRESHOLD_S
        )
    )
    if rt < threshold:
        LOGGER.info(
            f"refine backend auto -> device (probed round trip "
            f"{rt * 1e3:.1f}ms < {threshold * 1e3:.0f}ms)"
        )
        return REFINE_BACKEND_DEVICE
    LOGGER.info(
        f"refine backend auto -> host native (probed round trip "
        f"{rt * 1e3:.1f}ms >= {threshold * 1e3:.0f}ms)"
    )
    return REFINE_BACKEND_AUTO
