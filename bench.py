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

The record additionally carries (BASELINE.md's full metric set + the
environment fingerprint tying the number to a code state):
  train_chunks_per_s_per_chip — full train step (on-device
    featurization + fwd + bwd + AdamW, bf16, batch 2048), median of 3
    100-iter stream-dispatched blocks;
  hw_parity — pass/fail counts from the on-hardware parity suite
    (REMORA_TPU_HW_TESTS=1 pytest tests/test_tpu_hardware.py), run by
    the supervisor AFTER the measurement child exits (TPU clients must
    be serialized on tunneled backends);
  env — git SHA + dirty flag, device kind/count, jax version.
Disable the extra legs with REMORA_TPU_BENCH_TRAIN=0 /
REMORA_TPU_BENCH_HW=0.

Capture is supervised: the measurement runs in a child process (fresh
JAX backend init per attempt); the parent retries with backoff through
transient tunnel outages (observed minutes-to-hours — see PERF.md) and
ALWAYS emits a parseable record — a real value, or a structured error
with per-attempt diagnostics after the retry budget is exhausted. The
child additionally converts both hangs (watchdog thread) and fast
init/compile raises (try/except) into the same error-JSON schema.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

METRIC = "infer_fwd_chunks_per_s_per_chip"
_CHILD_ENV = "_REMORA_TPU_BENCH_CHILD"


def _emit(record):
    print(json.dumps(record), flush=True)


def _error_record(error, **extra):
    rec = {
        "metric": METRIC,
        "value": 0.0,
        "unit": "chunks/s",
        "vs_baseline": 0.0,
        "error": str(error)[:2000],
    }
    rec.update(extra)
    return rec


def _throughput(fwd, args, device, iters, repeats=1):
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



def _synth_inputs(batch=2048, width=400, kmer_len=9):
    """The production-shaped synthetic batch both bench legs measure
    (one recipe so the train and infer legs cannot silently diverge)."""
    max_seq = width // 5
    rng = np.random.default_rng(0)
    sigs = rng.normal(size=(batch, 1, width)).astype(np.float32)
    seq_lens = rng.integers(max_seq // 2, max_seq + 1, batch).astype(
        np.int16
    )
    seqs = rng.integers(0, 4, (batch, max_seq + kmer_len - 1)).astype(
        np.int8
    )
    maps = np.zeros((batch, max_seq + 1), np.int16)
    for b in range(batch):
        sl = seq_lens[b]
        maps[b, 1:sl] = np.sort(rng.integers(0, width + 1, sl - 1))
        maps[b, sl] = width
    labels = rng.integers(0, 2, batch).astype(np.int64)
    return sigs, seqs, maps, seq_lens, labels


def _train_throughput(iters=100, repeats=3):
    """Full train-step throughput (chunks/s/chip): on-device
    featurization + forward + backward + AdamW at production shapes,
    bf16 compute. Stream-dispatched blocks (state chained through the
    dispatches, ONE fence per block) — the schedule the real train loop
    uses; methodology per benchmarks/bench_train.py."""
    import jax
    import jax.numpy as jnp

    from remora_tpu.models.registry import get_model
    from remora_tpu.train.optim import TrainOpts
    from remora_tpu.train.train import make_train_step_raw

    M = get_model("ConvLSTM_w_ref")
    B, W, K = 2048, 400, 9
    params, bn = M.init(jax.random.PRNGKey(0), size=64, kmer_len=K,
                        num_out=2)
    tx = TrainOpts().load_optimizer()
    opt = tx.init(params)
    signal, seqs, maps, seq_lens, labels = (
        jnp.asarray(a) for a in _synth_inputs(B, W, K)
    )

    bb = K // 2
    step = make_train_step_raw(
        M, tx, (bb, K - 1 - bb), W, compute_dtype=jnp.bfloat16
    )
    p, bnn, o = params, bn, opt
    p, bnn, o, loss, _nf, _gm = step(
        p, bnn, o, signal, seqs, maps, seq_lens, labels
    )
    float(loss)  # compile + settle
    samples = []
    for _rep in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            p, bnn, o, loss, _nf, _gm = step(
                p, bnn, o, signal, seqs, maps, seq_lens, labels
            )
        float(loss)  # completion fence
        samples.append(iters * B / (time.perf_counter() - t0))
    return samples


def _env_fingerprint():
    """Tie the capture to a code + library + device state
    (advisor round 3: a throughput number without a fingerprint can't
    be matched to the tree that produced it)."""
    import jax

    repo = os.path.dirname(os.path.abspath(__file__))

    def _git(*args):
        try:
            out = subprocess.run(
                ["git", *args], cwd=repo, capture_output=True, text=True,
                timeout=30,
            )
            return out.stdout.strip() if out.returncode == 0 else None
        except Exception:  # noqa: BLE001 — fingerprint is best-effort
            return None

    devs = jax.devices()
    return {
        "git_sha": _git("rev-parse", "HEAD"),
        "git_dirty": bool(_git("status", "--porcelain")),
        "jax": jax.__version__,
        "device_kind": devs[0].device_kind,
        "platform": devs[0].platform,
        "local_device_count": jax.local_device_count(),
    }


def _run_hw_parity(timeout_s):
    """Run the on-hardware parity suite in its own process and parse the
    pass/fail counts. Runs AFTER the measurement child exits — two live
    JAX clients wedge a tunneled TPU backend."""
    import re

    repo = os.path.dirname(os.path.abspath(__file__))
    suite = os.path.join(repo, "tests", "test_tpu_hardware.py")
    env = dict(os.environ, REMORA_TPU_HW_TESTS="1")
    env.pop(_CHILD_ENV, None)
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", suite, "-q", "-p",
             "no:cacheprovider"],
            cwd=repo, env=env, capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"hw parity suite exceeded {timeout_s:.0f}s"}
    counts = dict.fromkeys(("passed", "failed", "skipped", "error"), 0)
    tail = (proc.stdout or "").strip().splitlines()
    for line in reversed(tail[-5:]):
        for num, kind in re.findall(r"(\d+) (passed|failed|skipped|error)",
                                    line):
            counts[kind] = int(num)
        if any(counts.values()):
            break
    if not any(counts.values()):
        return {
            "error": "could not parse pytest summary",
            "tail": "\n".join(tail[-3:])[-400:],
        }
    counts["returncode"] = proc.returncode
    return counts


def _start_watchdog():
    """Emit an error JSON line and exit if the device never comes up.

    A tunneled TPU backend can hang indefinitely on init/compile when
    its relay is wedged; the driver needs a parseable failure rather
    than a silent hang. REMORA_TPU_BENCH_TIMEOUT (seconds) overrides.
    """
    import threading

    seconds = float(os.environ.get("REMORA_TPU_BENCH_TIMEOUT", 1500))

    def boom():
        _emit(_error_record(
            f"bench did not complete in {seconds:.0f}s "
            "(TPU backend unavailable/wedged?)"
        ))
        os._exit(3)

    timer = threading.Timer(seconds, boom)
    timer.daemon = True
    timer.start()
    return timer


def measure():
    """One measurement attempt (runs in the child process)."""
    if os.environ.get("REMORA_TPU_BENCH_FAIL"):
        # capture-path self-test hook: lets tests verify that a raising
        # child still yields a parseable error record from the supervisor
        raise RuntimeError(os.environ["REMORA_TPU_BENCH_FAIL"])
    if os.environ.get("REMORA_TPU_BENCH_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    from remora_tpu.jax_setup import ensure_compilation_cache

    ensure_compilation_cache()

    from remora_tpu.kernels.encoded_kmers import (
        compute_encoded_kmer_batch as enc,
    )
    from remora_tpu.models import conv_lstm_model as M

    batch, width, kmer_len = 2048, 400, 9
    params, bn_state = M.init(
        jax.random.PRNGKey(0), size=64, kmer_len=kmer_len, num_out=2
    )

    def fwd(params, bn_state, sigs, seqs, maps, seq_lens):
        # the production eval_raw path: channels-last featurization + towers
        enc_kmers = enc(4, 4, seqs, maps, seq_lens, width,
                        channels_last=True)
        import jax.numpy as jnp

        logits, _ = M.forward(
            params, bn_state, jnp.swapaxes(sigs, 1, 2), enc_kmers,
            train=False, channels_last_in=True,
        )
        return logits

    sigs, seqs, maps, seq_lens, _labels = _synth_inputs(
        batch, width, kmer_len
    )
    args = (params, bn_state, sigs, seqs, maps, seq_lens)

    main_dev = jax.devices()[0]
    on_accel = main_dev.platform != "cpu"
    # variance control: 5 timed blocks, report the median + spread.
    # iters per block must amortize the per-block fence (the remote d2h
    # fetch costs ~20ms over the tunnel — at 20 iters that silently
    # under-reported throughput by ~25%; 100 iters bounds it at <3%)
    dev_samples = _throughput(
        fwd, args, main_dev, iters=100 if on_accel else 3,
        repeats=5 if on_accel else 2,
    )
    dev_tp = float(np.median(dev_samples))
    spread = (max(dev_samples) - min(dev_samples)) / dev_tp

    try:
        cpu_dev = jax.devices("cpu")[0]
    except RuntimeError:
        cpu_dev = None
    if on_accel and cpu_dev is not None:
        cpu_tp = _throughput(fwd, args, cpu_dev, iters=2)
    else:
        cpu_tp = dev_tp if not on_accel else None

    vs_baseline = (
        dev_tp / (5.0 * cpu_tp) if cpu_tp else float("nan")
    )
    record = {
        "metric": METRIC,
        "value": round(dev_tp, 1),
        "unit": "chunks/s",
        "vs_baseline": round(vs_baseline, 3),
        "spread_frac": round(spread, 3),
        "samples": [round(x, 1) for x in dev_samples],
        "platform": main_dev.platform,
        "env": _env_fingerprint(),
    }
    if on_accel and os.environ.get("REMORA_TPU_BENCH_BF16", "1") != "0":
        # the speed side of the measured bf16 drift contract (PERF.md
        # round 4: 20/205 ML bytes move by exactly ±1/256) — captured in
        # the same record as the byte-exact f32 number so the
        # speed/exactness trade is one artifact (VERDICT r4 #7)
        try:
            import jax.numpy as jnp

            from remora_tpu.infer.infer import _cast_state

            p16, bn16 = _cast_state(params, bn_state, jnp.bfloat16)

            def fwd_bf16(params, bn_state, sigs, seqs, maps, seq_lens):
                enc_kmers = enc(4, 4, seqs, maps, seq_lens, width,
                                out_dtype=jnp.bfloat16, channels_last=True)
                logits, _ = M.forward(
                    params, bn_state,
                    jnp.swapaxes(sigs, 1, 2).astype(jnp.bfloat16),
                    enc_kmers, train=False, channels_last_in=True,
                )
                return logits.astype(jnp.float32)

            bf_samples = _throughput(
                fwd_bf16, (p16, bn16, sigs, seqs, maps, seq_lens),
                main_dev, iters=100, repeats=3,
            )
            record["infer_fwd_bf16_chunks_per_s_per_chip"] = round(
                float(np.median(bf_samples)), 1
            )
            record["infer_fwd_bf16_samples"] = [
                round(x, 1) for x in bf_samples
            ]
        except Exception as exc:  # noqa: BLE001 — bf16 leg is additive
            record["infer_fwd_bf16_error"] = (
                f"{type(exc).__name__}: {exc}"[:400]
            )
    if on_accel and os.environ.get("REMORA_TPU_BENCH_TRAIN", "1") != "0":
        try:
            tr_samples = _train_throughput()
            record["train_chunks_per_s_per_chip"] = round(
                float(np.median(tr_samples)), 1
            )
            record["train_samples"] = [round(x, 1) for x in tr_samples]
        except Exception as exc:  # noqa: BLE001 — train leg is additive
            record["train_error"] = f"{type(exc).__name__}: {exc}"[:400]
    return record


def _child_main():
    watchdog = _start_watchdog()
    try:
        record = measure()
    except BaseException as exc:  # noqa: BLE001 — every failure must parse
        watchdog.cancel()
        _emit(_error_record(f"{type(exc).__name__}: {exc}"))
        sys.exit(4)
    watchdog.cancel()
    _emit(record)


def _last_json_line(text):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _run_child(timeout_s, extra_env=None):
    """One child attempt. Returns (record-or-None, diagnostic-string)."""
    env = dict(os.environ)
    env[_CHILD_ENV] = "1"
    env["REMORA_TPU_BENCH_TIMEOUT"] = str(timeout_s)
    if extra_env:
        env.update(extra_env)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            # the child's own watchdog fires first and exits cleanly;
            # this backstop only triggers if the watchdog itself wedged
            timeout=timeout_s + 240,
        )
    except subprocess.TimeoutExpired:
        return None, f"child exceeded hard timeout ({timeout_s + 240:.0f}s)"
    rec = _last_json_line(proc.stdout)
    if rec is None:
        tail = (proc.stderr or proc.stdout or "").strip()[-400:]
        return None, f"rc={proc.returncode}, no JSON line; tail: {tail}"
    if "error" in rec:
        return rec, f"rc={proc.returncode}, {rec['error'][:400]}"
    return rec, "ok"


def _probe_device(timeout_s=240):
    """Cheap backend-liveness probe in its own process (a wedged tunnel
    hangs even jax.devices(); never risk the full bench on a dead one)."""
    code = (
        "import jax\n"
        "from remora_tpu.jax_setup import honor_platform_env\n"
        "honor_platform_env()\n"
        "print([d.platform for d in jax.devices()])\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _supervise():
    t_start = time.monotonic()
    budget = float(os.environ.get("REMORA_TPU_BENCH_TOTAL_BUDGET", 5400))
    per_attempt = float(os.environ.get("REMORA_TPU_BENCH_TIMEOUT", 1500))
    deadline = t_start + budget
    attempts = []
    attempt_no = 0
    while True:
        remaining = deadline - time.monotonic()
        if remaining < 120:
            break
        attempt_no += 1
        timeout_s = max(120.0, min(remaining - 60.0, per_attempt))
        record, diag = _run_child(timeout_s)
        if record is not None and "error" not in record:
            if (
                record.get("platform") != "cpu"
                and os.environ.get("REMORA_TPU_BENCH_HW", "1") != "0"
            ):
                hw_budget = min(
                    1800.0, deadline - time.monotonic() - 60
                )
                if hw_budget >= 180.0:
                    record["hw_parity"] = _run_hw_parity(hw_budget)
                else:
                    # never overrun the global budget the retry loop
                    # has been respecting just to squeeze this leg in
                    record["hw_parity"] = {
                        "error": "skipped: bench budget exhausted"
                    }
            record["attempts"] = attempt_no
            record["elapsed_s"] = round(time.monotonic() - t_start, 1)
            _emit(record)
            return 0
        attempts.append(f"attempt {attempt_no}: {diag}")
        print(attempts[-1], file=sys.stderr, flush=True)
        # backoff, then wait for the backend to answer a cheap probe
        # before burning another full attempt (wedges last minutes to
        # hours; probing every ~5min matches observed recovery)
        base = float(os.environ.get("REMORA_TPU_BENCH_BACKOFF", 30.0))
        backoff = min(300.0, base * (2 ** (attempt_no - 1)))
        time.sleep(min(backoff, max(0.0, deadline - time.monotonic())))
        while time.monotonic() < deadline - 180:
            if _probe_device():
                break
            time.sleep(min(300.0, max(0.0, deadline - time.monotonic())))
    # retry budget exhausted: grab a CPU-only figure so the record still
    # carries a measurement, then emit the structured error
    cpu_value = None
    cpu_rec, _cpu_diag = _run_child(
        600, extra_env={"REMORA_TPU_BENCH_FORCE_CPU": "1"}
    )
    if cpu_rec is not None and "error" not in cpu_rec:
        cpu_value = cpu_rec.get("value")
    _emit(_error_record(
        f"TPU bench failed after {attempt_no} attempts in "
        f"{time.monotonic() - t_start:.0f}s",
        attempts=attempts[-8:],
        cpu_fallback_chunks_per_s=cpu_value,
    ))
    return 3


def main():
    if os.environ.get(_CHILD_ENV):
        _child_main()
    else:
        sys.exit(_supervise())


if __name__ == "__main__":
    main()
