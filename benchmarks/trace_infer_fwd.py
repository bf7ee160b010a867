"""Trace the headline inference forward (featurize + ConvLSTM eval)."""

import argparse
import glob
import gzip
import json
import time
from collections import defaultdict

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=2048)
    parser.add_argument("--chunk-width", type=int, default=400)
    parser.add_argument("--kmer-len", type=int, default=9)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--out", default="/tmp/remora_trace_fwd")
    args = parser.parse_args()

    from remora_tpu.jax_setup import ensure_compilation_cache

    ensure_compilation_cache()
    import jax
    import jax.numpy as jnp

    from remora_tpu.kernels.encoded_kmers import (
        compute_encoded_kmer_batch as enc,
    )
    from remora_tpu.models import conv_lstm_model as M

    B, W, K = args.batch_size, args.chunk_width, args.kmer_len
    S = W // 5
    params, bn_state = M.init(jax.random.PRNGKey(0), size=64, kmer_len=K,
                              num_out=2)

    @jax.jit
    def fwd(params, bn_state, sigs, seqs, maps, seq_lens, bump):
        e = enc(4, 4, seqs, maps, seq_lens, W)
        logits, _ = M.forward(params, bn_state, sigs + bump, e, train=False)
        return jnp.mean(logits)

    rng = np.random.default_rng(0)
    sigs = jnp.asarray(rng.normal(size=(B, 1, W)).astype(np.float32))
    seq_lens = jnp.asarray(
        rng.integers(S // 2, S + 1, B).astype(np.int16))
    seqs = jnp.asarray(rng.integers(0, 4, (B, S + K - 1)).astype(np.int8))
    maps_h = np.zeros((B, S + 1), np.int16)
    for b in range(B):
        sl = int(seq_lens[b])
        maps_h[b, 1:sl] = np.sort(rng.integers(0, W + 1, sl - 1))
        maps_h[b, sl] = W
    maps = jnp.asarray(maps_h)

    acc = jnp.float32(0)
    for _ in range(3):
        acc = acc * 1e-20 + fwd(params, bn_state, sigs, seqs, maps,
                                seq_lens, acc * 1e-20)
    _ = float(acc)
    with jax.profiler.trace(args.out):
        t0 = time.time()
        for _ in range(args.steps):
            acc = acc * 1e-20 + fwd(params, bn_state, sigs, seqs, maps,
                                    seq_lens, acc * 1e-20)
        _ = float(acc)
        wall = (time.time() - t0) / args.steps
    print(f"wall: {wall * 1e3:.3f} ms/batch")

    paths = sorted(glob.glob(f"{args.out}/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    evs = trace["traceEvents"]
    dev_pids = set()
    for ev in evs:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(ev["pid"])
    by_src = defaultdict(float)
    total = 0.0
    for ev in evs:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        a = ev.get("args") or {}
        if "long_name" not in a and "tf_op" not in a:
            continue
        dur = ev.get("dur", 0) / 1e3 / args.steps
        by_src[a.get("source", "?")] += dur
        total += dur
    print(f"device op total: {total:.3f} ms/batch")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {v:7.3f} ms  {k}")


if __name__ == "__main__":
    main()
