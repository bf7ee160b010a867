"""LSTM recurrence micro-benchmark: fused Pallas kernels vs XLA scan.

Chains iterations inside one jitted fori_loop (single dispatch) so the
measurement reflects device time, not the tunneled per-dispatch
round-trip. Inputs vary per iteration so XLA cannot hoist the body.
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seq-len", type=int, default=124)
    parser.add_argument("--batch-size", type=int, default=2048)
    parser.add_argument("--hidden", type=int, default=64)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--grad", action="store_true",
                        help="benchmark forward+backward")
    args = parser.parse_args()

    from remora_tpu.jax_setup import ensure_compilation_cache

    ensure_compilation_cache()
    import jax
    import jax.numpy as jnp

    from remora_tpu.kernels.pallas_lstm import lstm_fused
    from remora_tpu.models import layers as L

    T, B, H = args.seq_len, args.batch_size, args.hidden
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    params = L.lstm_init(jax.random.PRNGKey(0), H, H)
    params = jax.tree.map(lambda x: x.astype(dt), params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32)).astype(dt)

    def make(fn):
        if args.grad:
            g = jax.grad(lambda p, xx: jnp.sum(fn(p, xx).astype(jnp.float32)))

            def body(i, acc):
                gp = g(params, x + acc.astype(dt) * jnp.asarray(1e-12, dt))
                return acc + gp["w_hh"][0, 0].astype(jnp.float32)

        else:

            def body(i, acc):
                hs = fn(params, x + acc.astype(dt) * jnp.asarray(1e-12, dt))
                return acc + hs[-1, 0, 0].astype(jnp.float32)

        @jax.jit
        def run(k):
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    for name, fn in (
        ("scan", lambda p, xx: L.lstm(p, xx, impl="scan")),
        ("fused", lambda p, xx: lstm_fused(p, xx)),
    ):
        run = make(fn)
        t0 = time.time()
        float(run(2))
        c = time.time() - t0
        t0 = time.time()
        float(run(args.iters))
        per = (time.time() - t0) / args.iters * 1000
        kind = "fwd+bwd" if args.grad else "fwd"
        print(f"lstm {name:5s} {kind}: {per:7.2f} ms/iter (compile {c:.0f}s)")


if __name__ == "__main__":
    main()
