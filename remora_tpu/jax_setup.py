"""JAX runtime configuration helpers.

Centralizes persistent-compilation-cache setup (first XLA compiles on a
tunneled TPU backend can take minutes; the on-disk cache makes every
subsequent process start warm) and the CPU-platform override (the axon
TPU plugin ignores the JAX_PLATFORMS environment variable).
"""

import os
from pathlib import Path

_CACHE_INITIALIZED = False


def ensure_compilation_cache(cache_dir=None):
    """Enable the persistent compilation cache (idempotent)."""
    global _CACHE_INITIALIZED
    if _CACHE_INITIALIZED:
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "REMORA_TPU_COMPILE_CACHE",
            str(Path.home() / ".cache" / "remora_tpu_xla"),
        )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    _CACHE_INITIALIZED = True


def honor_platform_env():
    """Apply JAX_PLATFORMS from the environment via jax.config (the axon
    plugin does not honor the plain env var)."""
    plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def select_device(device):
    """Steer computation to a device: an integer index into
    ``jax.devices()`` or a platform name (e.g. "cpu"). Reference analog:
    the ``--device`` GPU selector (``util.py:81``).

    Platform names set ``jax_platforms`` (NOT ``jax_default_device``):
    ``jax.devices("cpu")`` would initialize every registered backend,
    so ``--device cpu`` could hang on a wedged TPU tunnel — the very
    situation the flag is for."""
    if device is None:
        return
    import jax

    try:
        idx = int(device)
    except (TypeError, ValueError):
        jax.config.update("jax_platforms", str(device).lower())
        return
    jax.config.update("jax_default_device", jax.devices()[idx])
