"""Experiment: train-step time across conv+BN implementations.

Times the full raw train step (featurize + fwd + bwd + AdamW) for each
REMORA_TPU_CONVBN impl in ONE process so tunnel/host state is equal.
"""

import argparse
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=2048)
    parser.add_argument("--chunk-width", type=int, default=400)
    parser.add_argument("--kmer-len", type=int, default=9)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--model", default="ConvLSTM_w_ref")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument(
        "--impls", default="plain,remat,fused"
    )
    parser.add_argument("--steps-per-launch", type=int, default=1)
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
    seqs = jnp.asarray(rng.integers(0, 4, (B, S + (K - 1))).astype(np.int8))
    maps_h = np.zeros((B, S + 1), np.int16)
    for b in range(B):
        sl = seq_lens_h[b]
        maps_h[b, 1:sl] = np.sort(rng.integers(0, W + 1, sl - 1))
        maps_h[b, sl] = W
    maps = jnp.asarray(maps_h)
    seq_lens = jnp.asarray(seq_lens_h)
    labels = jnp.asarray(rng.integers(0, 2, B).astype(np.int64))
    bb = K // 2

    from remora_tpu.train.train import make_train_step_raw_multi

    SPL = args.steps_per_launch
    if SPL > 1:
        stack = lambda a: jnp.broadcast_to(  # noqa: E731
            a[None], (SPL,) + a.shape
        )
        m_signal, m_seqs, m_maps = stack(signal), stack(seqs), stack(maps)
        m_lens, m_labels = stack(seq_lens), stack(labels)

    results = {}
    for impl in args.impls.split(","):
        os.environ["REMORA_TPU_CONVBN"] = impl
        if SPL > 1:
            step = make_train_step_raw_multi(
                M, tx, (bb, K - 1 - bb), W, SPL,
                compute_dtype=jnp.bfloat16 if args.bf16 else None,
                donate=False,
            )
            inputs = (m_signal, m_seqs, m_maps, m_lens, m_labels)
        else:
            step = make_train_step_raw(
                M, tx, (bb, K - 1 - bb), W,
                compute_dtype=jnp.bfloat16 if args.bf16 else None,
                donate=False,
            )
            inputs = (signal, seqs, maps, seq_lens, labels)
        t0 = time.time()
        p, bnn, o = params, bn, opt
        p, bnn, o, loss, _nf, _gm = step(p, bnn, o, *inputs)
        loss0 = float(loss if loss.ndim == 0 else loss[-1])
        print(f"[{impl}] compile: {time.time() - t0:.1f}s loss={loss0:.4f}")
        samples = []
        for _trial in range(4):
            t0 = time.time()
            for _i in range(max(1, args.iters // SPL)):
                p, bnn, o, loss, _nf, _gm = step(p, bnn, o, *inputs)
            _ = float(loss if loss.ndim == 0 else loss[-1])
            dt = time.time() - t0
            samples.append(max(1, args.iters // SPL) * SPL * B / dt)
        samples = sorted(samples[1:])
        tp = samples[len(samples) // 2]
        results[impl] = tp
        print(f"[{impl}] {B / tp * 1000:.2f}ms/step -> {tp:,.0f} chunks/s "
              f"(trials: {', '.join(f'{s:,.0f}' for s in samples)})")
    best = max(results, key=results.get)
    print(f"best: {best} ({results[best]:,.0f} chunks/s)")


if __name__ == "__main__":
    main()
