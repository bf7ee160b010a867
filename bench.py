"""Headline benchmark: inference device-stage throughput (chunks/s/chip).

Measures the full device stage of the streaming inference pipeline —
on-device encoded-kmer featurization (0/1 MXU matmul) + the flagship
ConvLSTM forward — at production shapes (batch 2048, chunk width 400,
9-mer context) on the default JAX device, and the same computation on
host CPU for the vs-baseline ratio.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "chunks/s", "vs_baseline": N}
where vs_baseline = device_throughput / (5 * cpu_throughput): >= 1.0
means the BASELINE.md target (>=5x CPU per chip) is met.
"""

import json
import time

import numpy as np


def _throughput(fwd, args, device, iters, warmup=1, repeats=1):
    """Time `iters` chained forward passes inside ONE jitted fori_loop.

    The loop carries a scalar data dependency between iterations, so the
    device must execute them sequentially, and the single dispatch + single
    block is immune to the remote-dispatch async-timing artifacts of
    tunneled TPU backends. With ``repeats`` > 1 returns a list of
    per-block throughputs (variance control: the driver-captured number
    is the median of >= 5 timed blocks).
    """
    import jax
    import jax.numpy as jnp

    params, bn_state, sigs, seqs, maps, seq_lens = jax.device_put(
        args, device
    )

    def loop(params, bn_state, sigs, seqs, maps, seq_lens, seed, n):
        def body(_i, carry):
            acc, s = carry
            out = fwd(params, bn_state, s + acc * 1e-20, seqs, maps,
                      seq_lens)
            return acc + jnp.mean(out), s

        acc, _ = jax.lax.fori_loop(
            0, n, body, (seed * 1e-20, sigs)
        )
        return acc

    fn = jax.jit(loop, static_argnames="n")
    # scope the default device over TRACING so implementation choices
    # (fused Pallas LSTM vs scan) follow the measured device — the CPU
    # baseline leg must not trace TPU kernels. Warmup with the SAME
    # static n (compile cache) but a DIFFERENT seed input, so remote
    # backends cannot alias the timed dispatch to the warmup result;
    # fetching the scalar value is the completion fence
    with jax.default_device(device):
        float(fn(params, bn_state, sigs, seqs, maps, seq_lens,
                 jnp.float32(0), n=iters))
        samples = []
        for rep in range(repeats):
            t0 = time.perf_counter()
            float(fn(params, bn_state, sigs, seqs, maps, seq_lens,
                     jnp.float32(rep + 1), n=iters))
            dt = time.perf_counter() - t0
            samples.append(iters * sigs.shape[0] / dt)
    return samples if repeats > 1 else samples[0]


def _start_watchdog():
    """Emit an error JSON line and exit if the device never comes up.

    A tunneled TPU backend can hang indefinitely on init/compile when
    its relay is wedged; the driver needs a parseable failure rather
    than a silent hang. REMORA_TPU_BENCH_TIMEOUT (seconds) overrides.
    """
    import os
    import threading

    seconds = float(os.environ.get("REMORA_TPU_BENCH_TIMEOUT", 2400))

    def boom():
        print(
            json.dumps(
                {
                    "metric": "infer_fwd_chunks_per_s_per_chip",
                    "value": 0.0,
                    "unit": "chunks/s",
                    "vs_baseline": 0.0,
                    "error": (
                        f"bench did not complete in {seconds:.0f}s "
                        "(TPU backend unavailable/wedged?)"
                    ),
                }
            ),
            flush=True,
        )
        os._exit(3)

    timer = threading.Timer(seconds, boom)
    timer.daemon = True
    timer.start()
    return timer


def main():
    watchdog = _start_watchdog()
    import jax
    from remora_tpu.jax_setup import ensure_compilation_cache

    ensure_compilation_cache()

    from remora_tpu.kernels.encoded_kmers import (
        compute_encoded_kmer_batch as enc,
    )
    from remora_tpu.models import conv_lstm_model as M

    batch, width, kmer_len = 2048, 400, 9
    max_seq = width // 5
    params, bn_state = M.init(
        jax.random.PRNGKey(0), size=64, kmer_len=kmer_len, num_out=2
    )

    def fwd(params, bn_state, sigs, seqs, maps, seq_lens):
        enc_kmers = enc(4, 4, seqs, maps, seq_lens, width)
        logits, _ = M.forward(params, bn_state, sigs, enc_kmers, train=False)
        return logits

    rng = np.random.default_rng(0)
    sigs = rng.normal(size=(batch, 1, width)).astype(np.float32)
    seq_lens = rng.integers(max_seq // 2, max_seq + 1, batch).astype(np.int16)
    seqs = rng.integers(0, 4, (batch, max_seq + kmer_len - 1)).astype(np.int8)
    maps = np.zeros((batch, max_seq + 1), np.int16)
    for b in range(batch):
        sl = seq_lens[b]
        maps[b, 1:sl] = np.sort(rng.integers(0, width + 1, sl - 1))
        maps[b, sl] = width
    args = (params, bn_state, sigs, seqs, maps, seq_lens)

    main_dev = jax.devices()[0]
    on_accel = main_dev.platform != "cpu"
    # variance control: 5 timed blocks, report the median + spread
    dev_samples = _throughput(
        fwd, args, main_dev, iters=20 if on_accel else 3,
        repeats=5 if on_accel else 2,
    )
    dev_tp = float(np.median(dev_samples))
    spread = (max(dev_samples) - min(dev_samples)) / dev_tp

    try:
        cpu_dev = jax.devices("cpu")[0]
    except RuntimeError:
        cpu_dev = None
    if on_accel and cpu_dev is not None:
        cpu_tp = _throughput(fwd, args, cpu_dev, iters=2, warmup=1)
    else:
        cpu_tp = dev_tp if not on_accel else None

    vs_baseline = (
        dev_tp / (5.0 * cpu_tp) if cpu_tp else float("nan")
    )
    watchdog.cancel()
    print(
        json.dumps(
            {
                "metric": "infer_fwd_chunks_per_s_per_chip",
                "value": round(dev_tp, 1),
                "unit": "chunks/s",
                "vs_baseline": round(vs_baseline, 3),
                "spread_frac": round(spread, 3),
                "samples": [round(x, 1) for x in dev_samples],
            }
        )
    )


if __name__ == "__main__":
    main()
