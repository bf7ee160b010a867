"""Training-step throughput at production shapes (chunks/s/chip).

Full jitted step: on-device featurization + forward + backward + AdamW.
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=2048)
    parser.add_argument("--chunk-width", type=int, default=400)
    parser.add_argument("--kmer-len", type=int, default=9)
    parser.add_argument("--size", type=int, default=64)
    # iters per timed trial must amortize the ~20ms per-trial completion
    # fence on a tunneled backend (20 iters under-reported by ~1ms/step)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--model", default="ConvLSTM_w_ref")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute with f32 master weights")
    args = parser.parse_args()

    from remora_tpu.jax_setup import ensure_compilation_cache

    ensure_compilation_cache()
    import jax
    import jax.numpy as jnp

    from remora_tpu.models.registry import get_model
    from remora_tpu.train.optim import TrainOpts
    from remora_tpu.train.train import make_train_step_raw

    M = get_model(args.model)
    B, W, K = args.batch_size, args.chunk_width, args.kmer_len
    S = W // 5
    params, bn = M.init(
        jax.random.PRNGKey(0), size=args.size, kmer_len=K, num_out=2
    )
    tx = TrainOpts().load_optimizer()
    opt = tx.init(params)
    rng = np.random.default_rng(0)
    signal = jnp.asarray(rng.normal(size=(B, 1, W)).astype(np.float32))
    seq_lens_h = rng.integers(S // 2, S + 1, B).astype(np.int16)
    seqs = jnp.asarray(
        rng.integers(0, 4, (B, S + (K - 1))).astype(np.int8)
    )
    maps_h = np.zeros((B, S + 1), np.int16)
    for b in range(B):
        sl = seq_lens_h[b]
        maps_h[b, 1:sl] = np.sort(rng.integers(0, W + 1, sl - 1))
        maps_h[b, sl] = W
    maps = jnp.asarray(maps_h)
    seq_lens = jnp.asarray(seq_lens_h)
    labels = jnp.asarray(rng.integers(0, 2, B).astype(np.int64))

    bb = K // 2
    step = make_train_step_raw(
        M, tx, (bb, K - 1 - bb), W,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )

    # stream-dispatch: enqueue the steps asynchronously (state chained
    # through the dispatches, so the device runs them back-to-back) and
    # fence ONCE with a final loss fetch. This is how the real train
    # loop feeds the device; a jitted fori_loop harness was tried first
    # but the while-loop carries add ~1.7ms/step that the streamed
    # schedule does not pay (7.2 vs 5.5ms device time at batch 2048).
    t0 = time.time()
    p, bnn, o = params, bn, opt
    p, bnn, o, loss, _nf, _gm = step(
        p, bnn, o, signal, seqs, maps, seq_lens, labels
    )
    print(f"compile: {time.time() - t0:.1f}s loss={float(loss):.4f}")

    samples = []
    for _trial in range(4):
        t0 = time.time()
        for _i in range(args.iters):
            p, bnn, o, loss, _nf, _gm = step(
                p, bnn, o, signal, seqs, maps, seq_lens, labels
            )
        _ = float(loss)  # the completion fence
        dt = time.time() - t0
        samples.append(args.iters * B / dt)
    samples = sorted(samples[1:])  # first trial drains any backlog
    tp = samples[len(samples) // 2]
    print(
        f"train: {B / tp * 1000:.1f}ms/step -> {tp:,.0f} chunks/s "
        f"(trials: {', '.join(f'{s:,.0f}' for s in samples)})"
    )


if __name__ == "__main__":
    main()
