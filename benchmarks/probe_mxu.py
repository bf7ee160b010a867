"""Empirical MXU cost probe: Mosaic matmul time vs (M, K, N) shape.

The conv-tower kernels need matmuls with small contraction (K = C_in*k
taps, 5..640) and small output rows (M = C_out, 4..64). Whether such
matmuls pay the full 128-padded MXU pass or scale with the true K/M
decides the whole in-kernel conv strategy — so measure, don't guess.

Each probe times ITERS chained matmuls inside one Pallas program (VMEM-
resident operands, f32 accumulation, result folded into a carry so the
loop can't be elided), reporting ns/matmul and effective TFLOP/s.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -m benchmarks.probe_mxu
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe_kernel(a_ref, b_ref, out_ref, *, iters):
    def body(i, carry):
        # fold the carry into A so iterations are data-dependent; the
        # carry is one scalar read from the result (no full reduction)
        a = a_ref[:] + carry.astype(a_ref.dtype)
        c = jnp.dot(a, b_ref[:], preferred_element_type=jnp.float32)
        return c[0, 0] * 1e-20

    acc = jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("iters",))
def _probe(a, b, iters):
    return pl.pallas_call(
        functools.partial(_probe_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(a, b)


def time_shape(M, K, N, dtype=jnp.bfloat16, lo=100, hi=4100):
    """Per-matmul cost via the ITERS slope: t(hi) - t(lo) over hi-lo
    matmuls. A direct per-call timing only measures the ~25ms d2h
    scalar fence of the tunneled backend (PERF.md round 3), and the
    fence jitter is +-ms, so the iteration contrast must put the
    matmul term well above it — 4000 matmuls at us-scale does."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(M, K)), dtype)
    b = jnp.asarray(rng.normal(size=(K, N)), dtype)
    float(_probe(a, b, lo)[0, 0])  # compile + warm
    float(_probe(a, b, hi)[0, 0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(_probe(a, b, lo)[0, 0])
        t1 = time.perf_counter()
        float(_probe(a, b, hi)[0, 0])
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (hi - lo))
    tflops = 2 * M * K * N / best / 1e12
    print(
        f"  ({M:4d},{K:4d}) @ ({K:4d},{N:6d}) {str(dtype.__name__):>9}"
        f"  {best * 1e6:8.2f} us  {tflops:7.2f} TF/s",
        flush=True,
    )
    return best


def main():
    from remora_tpu.jax_setup import ensure_compilation_cache

    ensure_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    N = 16384
    print("-- contraction-dim scaling (M=64) --")
    for K in (8, 32, 128, 512):
        time_shape(64, K, N)
    print("-- output-rows scaling (K=128) --")
    for M in (8, 32, 128, 256):
        time_shape(M, 128, N)
    print("-- conv-candidate shapes --")
    # (O, I*K) x (I*K, Bt*T') for the tower layers at Bt=256
    for M, K, n in (
        (4, 5, 256 * 396),      # c1
        (16, 20, 256 * 392),    # c2
        (16, 180, 256 * 396),   # s1
        (64, 144, 256 * 128),   # c3 (stride-split)
        (64, 208, 256 * 128),   # s2
        (64, 640, 256 * 124),   # merge
        (128, 640, 256 * 124),  # merge, O padded to 128 by hand
    ):
        time_shape(M, K, n)
    print("-- f32 reference --")
    time_shape(64, 128, N, dtype=jnp.float32)


if __name__ == "__main__":
    main()
