"""Hardware (real-TPU) parity suite.

Run on a TPU host with:

    REMORA_TPU_HW_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q

Every test is marked ``tpu`` and skipped unless REMORA_TPU_HW_TESTS is
set AND the default JAX backend is a real TPU (the normal test session
forces CPU — see conftest.py). This turns the PERF.md hardware claims
into re-runnable assertions:

  * Pallas banded-DP path-exactness vs the host DP (both algorithms,
    long reads and wide bands included)
  * fused Pallas LSTM forward bit-identity + gradient closeness vs the
    lax.scan implementation
  * device encoded-kmer featurizer bit-equality vs the host featurizer
  * raw (on-device featurization) vs host-featurized forward passes
    produce identical ML-tag bytes
  * the batched device refine entry point matches the host per-read
    refine bit-for-bit at scale_iters=1
"""

import os

import numpy as np
import pytest


def _on_tpu():
    if not os.environ.get("REMORA_TPU_HW_TESTS"):
        return False
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not _on_tpu(),
        reason="hardware suite: set REMORA_TPU_HW_TESTS=1 on a TPU host",
    ),
]


def _random_dp_reads(rng, n_reads, max_seq, max_spb, bhw):
    from remora_tpu.refine import dp as host_dp
    from remora_tpu.refine.band import (
        adjust_seq_band,
        compute_sig_band,
        convert_to_seq_band,
    )
    from remora_tpu.refine.refiner import compute_dwell_pen_array

    sdp = compute_dwell_pen_array(4, 3, 0.5)
    reads, host_paths = [], []
    for _ in range(n_reads):
        seq_len = int(rng.integers(10, max_seq))
        spb = rng.integers(1, max_spb, seq_len)
        bps = np.concatenate([[0], np.cumsum(spb)]).astype(np.int64)
        levels = rng.normal(size=seq_len).astype(np.float32)
        signal = rng.normal(size=int(bps[-1])).astype(np.float32)
        sig_band = compute_sig_band(bps, levels, bhw=bhw)
        seq_band = convert_to_seq_band(sig_band)
        adjust_seq_band(seq_band)
        reads.append((signal, levels, seq_band))
    return reads, sdp


@pytest.mark.parametrize("algo", ["Viterbi", "dwell_penalty"])
def test_hw_pallas_dp_path_exact(algo):
    """Single-launch Pallas DP on hardware: 0 path diffs vs the host DP.

    Reference semantics: refine_signal_map_core.pyx:256–449."""
    from remora_tpu.kernels.pallas_dp import refine_batch_pallas
    from remora_tpu.refine import dp as host_dp

    rng = np.random.default_rng(2024)
    reads, sdp = _random_dp_reads(rng, 32, max_seq=300, max_spb=12, bhw=5)
    host_paths = [
        host_dp.seq_banded_dp(sig, lv, bd, sdp, algo)[1]
        for sig, lv, bd in reads
    ]
    dev_paths = refine_batch_pallas(reads, sdp, algo=algo, interpret=False)
    n_diff = sum(
        int(np.count_nonzero(hp != dp_))
        for hp, dp_ in zip(host_paths, dev_paths)
    )
    assert n_diff == 0, f"{n_diff} path position diffs on hardware"


def test_hw_pallas_dp_long_read_wide_band():
    """Long-read/wide-band geometry (multiple base chunks + W tiles)."""
    from remora_tpu.kernels.pallas_dp import refine_batch_pallas
    from remora_tpu.refine import dp as host_dp

    rng = np.random.default_rng(7)
    reads, sdp = _random_dp_reads(rng, 4, max_seq=2000, max_spb=15, bhw=9)
    for (sig, lv, bd), dev_path in zip(
        reads, refine_batch_pallas(reads, sdp, algo="dwell_penalty",
                                   interpret=False)
    ):
        host_path = host_dp.seq_banded_dp(sig, lv, bd, sdp,
                                          "dwell_penalty")[1]
        assert np.array_equal(host_path, dev_path)


def test_hw_fused_lstm_forward_and_grad():
    """Fused Pallas LSTM vs the XLA scan AT EQUAL MATMUL PRECISION.

    The fused kernel forces Precision.HIGHEST for f32 operands; the
    scan's dots follow the ambient default (bf16 passes on TPU, ~1e-3
    off f32 truth — measured 1638376/1638400 element diffs), so the
    scan leg must be pinned to HIGHEST for a meaningful comparison.
    Bit-identity still isn't guaranteed — the fused layer computes one
    concatenated [x;h;1] @ W_aug dot where the scan sums two separate
    dots (different f32 accumulation split) — so assert tight closeness.
    """
    import jax
    import jax.numpy as jnp

    from remora_tpu.kernels.pallas_lstm import lstm_fused
    from remora_tpu.models import layers as L

    T, B, H = 100, 256, 64
    params = L.lstm_init(jax.random.PRNGKey(0), H, H)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    probe = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))

    with jax.default_matmul_precision("highest"):
        ref = np.asarray(jax.jit(
            lambda p, xx: L.lstm(p, xx, impl="scan")
        )(params, x))
    out = np.asarray(jax.jit(lambda p, xx: lstm_fused(p, xx))(params, x))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda p, xx: jnp.sum(fn(p, xx) * probe)

    with jax.default_matmul_precision("highest"):
        ref_g = jax.jit(jax.grad(
            loss(lambda p, xx: L.lstm(p, xx, impl="scan")), argnums=(0, 1)
        ))(params, x)
    out_g = jax.jit(jax.grad(loss(lstm_fused), argnums=(0, 1)))(params, x)
    for r, o in zip(jax.tree.leaves(ref_g), jax.tree.leaves(out_g)):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(o), rtol=1e-4, atol=1e-4
        )


def test_hw_device_featurizer_bit_equal():
    from remora_tpu.data.encoded_kmers import (
        compute_encoded_kmer_batch as host_enc,
    )
    from remora_tpu.kernels.encoded_kmers import (
        compute_encoded_kmer_batch as dev_enc,
    )

    rng = np.random.default_rng(5)
    B, S, bb, ab, W = 512, 80, 4, 4, 400
    seq_lens = rng.integers(2, S + 1, B).astype(np.int16)
    seqs = rng.integers(-1, 4, (B, S + bb + ab)).astype(np.int8)
    maps = np.zeros((B, S + 1), dtype=np.int16)
    for b in range(B):
        sl = seq_lens[b]
        maps[b, 1:sl] = np.sort(rng.integers(0, W + 1, sl - 1))
        maps[b, sl] = W
    h = host_enc(bb, ab, seqs, maps, seq_lens)
    d = np.asarray(dev_enc(bb, ab, seqs, maps, seq_lens, W))
    assert np.array_equal(h, d)


def test_hw_raw_vs_host_featurization_ml_bytes():
    """Raw (on-device featurization) and host-featurized forward passes
    yield identical floor(p*256) ML bytes — the e2e tag-identity claim
    as a direct assertion."""
    import jax
    import jax.numpy as jnp

    from remora_tpu.data.encoded_kmers import (
        compute_encoded_kmer_batch as host_enc,
    )
    from remora_tpu.kernels.encoded_kmers import (
        compute_encoded_kmer_batch as dev_enc,
    )
    from remora_tpu.models import conv_lstm_model as M

    B, W, kmer_len = 512, 400, 9
    S = W // 5
    params, bn_state = M.init(
        jax.random.PRNGKey(0), size=64, kmer_len=kmer_len, num_out=2
    )
    rng = np.random.default_rng(1)
    sigs = rng.normal(size=(B, 1, W)).astype(np.float32)
    seq_lens = rng.integers(S // 2, S + 1, B).astype(np.int16)
    seqs = rng.integers(0, 4, (B, S + kmer_len - 1)).astype(np.int8)
    maps = np.zeros((B, S + 1), np.int16)
    for b in range(B):
        sl = seq_lens[b]
        maps[b, 1:sl] = np.sort(rng.integers(0, W + 1, sl - 1))
        maps[b, sl] = W

    @jax.jit
    def fwd_raw(params, bn_state, sigs, seqs, maps, seq_lens):
        enc = dev_enc(4, 4, seqs, maps, seq_lens, W)
        return M.forward(params, bn_state, sigs, enc, train=False)[0]

    @jax.jit
    def fwd_host(params, bn_state, sigs, enc):
        return M.forward(params, bn_state, sigs, enc, train=False)[0]

    logits_raw = np.asarray(
        fwd_raw(params, bn_state, sigs, seqs, maps, seq_lens)
    )
    enc = host_enc(4, 4, seqs, maps, seq_lens)
    logits_host = np.asarray(fwd_host(params, bn_state, sigs, enc))

    def ml_bytes(logits):
        probs = np.exp(logits - logits.max(1, keepdims=True))
        probs /= probs.sum(1, keepdims=True)
        scaled = np.floor(probs * 256)
        scaled[scaled == 256] = 255
        return scaled.astype(np.uint8)

    assert np.array_equal(ml_bytes(logits_raw), ml_bytes(logits_host))


def test_hw_refine_reads_batch_exact():
    """Batched device refine == host per-read refine at scale_iters=1."""
    from tests.test_refine import _synthetic_read, _synthetic_refiner

    rng = np.random.default_rng(11)
    smr = _synthetic_refiner(scale_iters=1)
    reads = [_synthetic_read(rng, smr, n) for n in (150, 400, 80, 1000)]
    singles = [rd.copy() for rd in reads]
    for rd in singles:
        rd.refine_signal_mapping(smr)
    errs = smr.refine_reads_batch(reads)
    assert errs == [None] * len(reads)
    for got, want in zip(reads, singles):
        assert got.shift == want.shift and got.scale == want.scale
        assert np.array_equal(got.seq_to_sig_map, want.seq_to_sig_map)


def test_hw_lstm_last_only():
    """Last-only inference kernel == full fused forward's final step on
    hardware, across ragged time tails."""
    import jax
    import jax.numpy as jnp

    from remora_tpu.kernels.pallas_lstm import lstm_fused, lstm_last_fused
    from remora_tpu.models import layers as L

    for T in (124, 128, 5):
        B, H = 2048, 64
        params = L.lstm_init(jax.random.PRNGKey(3), H, H)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
        full = np.asarray(
            jax.jit(lambda p, xx: lstm_fused(p, xx))(params, x)
        )[-1]
        last = np.asarray(
            jax.jit(lambda p, xx: lstm_last_fused(p, xx))(params, x)
        )
        n_diff = int(np.count_nonzero(full != last))
        assert n_diff == 0, f"T={T}: {n_diff}/{full.size} diffs"
        # the scan leg must run at HIGHEST to be comparable (its default
        # f32 dots are bf16 passes on TPU, ~1e-3 off)
        with jax.default_matmul_precision("highest"):
            scan = np.asarray(
                jax.jit(lambda p, xx: L.lstm(p, xx, impl="scan"))(
                    params, x
                )
            )[-1]
        assert np.allclose(scan, last, atol=1e-5), T


def test_hw_conv_bn_swish_fused_parity():
    """Fused conv+BN+swish custom VJP vs the plain path on hardware:
    output, state, and gradient closeness at f32."""
    import jax
    import jax.numpy as jnp

    from remora_tpu.models import layers as L

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    conv_p = L.conv1d_init(k1, 16, 64, 9)
    bn_p, _ = L.batchnorm_init(64)
    state = {
        "mean": jnp.linspace(-1.0, 1.0, 64),
        "var": jnp.linspace(0.5, 2.0, 64),
    }
    x = jax.random.normal(k2, (256, 200, 16))  # channels-last (B, T, C)

    def run(which):
        @jax.jit
        def f(cp, bp, xx):
            def loss(cp, bp, xx):
                out, ns = L.conv_bn_swish(
                    cp, bp, state, xx, stride=3, train=True, impl=which
                )
                return jnp.mean(out ** 2), (out, ns)

            return jax.value_and_grad(
                loss, argnums=(0, 1, 2), has_aux=True
            )(cp, bp, xx)

        return f(conv_p, bn_p, x)

    (l0, (o0, s0)), g0 = run("plain")
    (l1, (o1, s1)), g1 = run("fused")
    assert abs(float(l0 - l1)) <= 1e-5
    assert float(jnp.max(jnp.abs(o0 - o1))) <= 1e-4
    for key in ("mean", "var"):
        assert float(jnp.max(jnp.abs(s0[key] - s1[key]))) <= 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-3
        assert float(jnp.max(jnp.abs(a - b))) <= 1e-3 * scale + 1e-5


def test_hw_pallas_dp_kilowide_band():
    """A ~3900-sample stall (band width near 4096) through the device DP
    on real hardware: VMEM feasibility + path exactness at the geometry
    behind REFINE_DEVICE_MAX_BAND=4096 (round 5: per-base DMA'd
    traceback + the raised scoped-VMEM allowance; the 2000/1000/700
    stalls keep the earlier caps' geometries covered)."""
    from remora_tpu.kernels.pallas_dp import refine_batch_pallas
    from remora_tpu.refine import dp as host_dp
    from remora_tpu.refine.band import (
        adjust_seq_band,
        compute_sig_band,
        convert_to_seq_band,
    )
    from remora_tpu.refine.refiner import compute_dwell_pen_array

    rng = np.random.default_rng(3)
    sdp = compute_dwell_pen_array(4, 3, 0.5)
    reads = []
    for stall in (3900, 2000, 1000, 700):
        seq_len = 40
        spb = rng.integers(1, 8, seq_len)
        spb[seq_len // 3] = stall
        bps = np.concatenate([[0], np.cumsum(spb)]).astype(np.int64)
        levels = rng.normal(size=seq_len).astype(np.float32)
        signal = rng.normal(size=int(bps[-1])).astype(np.float32)
        sig_band = compute_sig_band(bps, levels, bhw=5)
        seq_band = convert_to_seq_band(sig_band)
        adjust_seq_band(seq_band)
        reads.append((signal, levels, seq_band))
    w = max(int((bd[1] - bd[0]).max()) for _s, _l, bd in reads)
    assert w > 3800, w
    host_paths = [
        host_dp.seq_banded_dp(sig, lv, bd, sdp, "dwell_penalty")[1]
        for sig, lv, bd in reads
    ]
    dev_paths = refine_batch_pallas(
        reads, sdp, algo="dwell_penalty", interpret=False
    )
    for hp, dp_ in zip(host_paths, dev_paths):
        assert np.array_equal(hp, dp_)
