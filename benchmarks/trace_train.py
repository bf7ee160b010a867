"""Capture a device trace of the train step and print per-op totals.

Runs N steps under jax.profiler.trace, then parses the perfetto JSON and
aggregates XLA-op durations per step, grouped by a coarse name bucket.
"""

import argparse
import glob
import gzip
import json
import os
import time
from collections import defaultdict

import numpy as np


def bucket(name):
    n = name.lower()
    for key in (
        "fusion", "convolution", "dot", "reduce", "copy", "transpose",
        "custom-call", "scatter", "gather", "dynamic", "select", "while",
    ):
        if key in n:
            return key
    return "other"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=2048)
    parser.add_argument("--chunk-width", type=int, default=400)
    parser.add_argument("--kmer-len", type=int, default=9)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--model", default="ConvLSTM_w_ref")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--out", default="/tmp/remora_trace")
    parser.add_argument("--top", type=int, default=40)
    parser.add_argument("--steps-per-launch", type=int, default=1)
    parser.add_argument("--donate", action="store_true")
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
    SPL = args.steps_per_launch
    if SPL > 1:
        from remora_tpu.train.train import make_train_step_raw_multi

        step = make_train_step_raw_multi(
            M, tx, (bb, K - 1 - bb), W, SPL,
            compute_dtype=jnp.bfloat16 if args.bf16 else None,
            donate=args.donate,
        )
        stk = lambda a: jnp.broadcast_to(a[None], (SPL,) + a.shape)  # noqa
        inputs = (stk(signal), stk(seqs), stk(maps), stk(seq_lens),
                  stk(labels))
    else:
        step = make_train_step_raw(
            M, tx, (bb, K - 1 - bb), W,
            compute_dtype=jnp.bfloat16 if args.bf16 else None,
            donate=args.donate,
        )
        inputs = (signal, seqs, maps, seq_lens, labels)

    p, bnn, o = params, bn, opt
    for _ in range(3):  # warm
        p, bnn, o, loss, _nf, _gm = step(p, bnn, o, *inputs)
    _ = float(loss if loss.ndim == 0 else loss[-1])

    n_launch = max(1, args.steps // SPL)
    with jax.profiler.trace(args.out):
        t0 = time.time()
        for _ in range(n_launch):
            p, bnn, o, loss, _nf, _gm = step(p, bnn, o, *inputs)
        _ = float(loss if loss.ndim == 0 else loss[-1])
        wall = (time.time() - t0) / (n_launch * SPL)
    args.steps = n_launch * SPL
    print(f"wall: {wall * 1e3:.2f} ms/step")

    paths = sorted(
        glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no trace under {args.out}"
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    # device-track pids: process_name metadata containing "TPU"/"device"
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(ev["pid"])
    per_name = defaultdict(float)
    per_bucket = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = ev.get("dur", 0) / 1e3 / args.steps  # us -> ms, per step
        name = ev.get("name", "?")
        per_name[name] += dur
        per_bucket[bucket(name)] += dur
        total += dur
    print(f"device busy: {total:.3f} ms/step (sum over device tracks)")
    print("\n-- by bucket --")
    for k, v in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print(f"  {v:7.3f} ms  {k}")
    print(f"\n-- top {args.top} ops --")
    for k, v in sorted(per_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {v:7.3f} ms  {k[:110]}")


if __name__ == "__main__":
    main()
