"""Device (XLA) kernel parity tests against the host implementations."""

import numpy as np
import pytest

from remora_tpu.data.encoded_kmers import (
    compute_encoded_kmer_batch as host_enc,
)
from remora_tpu.kernels.encoded_kmers import (
    compute_encoded_kmer_batch as dev_enc,
)
from remora_tpu.kernels.pallas_dp import refine_batch_pallas
from remora_tpu.kernels.refine_dp import refine_batch
from remora_tpu.refine import dp as host_dp
from remora_tpu.refine.band import (
    adjust_seq_band,
    compute_sig_band,
    convert_to_seq_band,
)
from remora_tpu.refine.refiner import compute_dwell_pen_array


@pytest.mark.parametrize("algo", ["Viterbi", "dwell_penalty"])
def test_device_dp_matches_host(algo):
    rng = np.random.default_rng(3)
    sdp = compute_dwell_pen_array(4, 3, 0.5)
    reads, host_paths = [], []
    for _ in range(16):
        seq_len = int(rng.integers(10, 100))
        spb = rng.integers(1, 12, seq_len)
        bps = np.concatenate([[0], np.cumsum(spb)]).astype(np.int64)
        levels = rng.normal(size=seq_len).astype(np.float32)
        signal = rng.normal(size=int(bps[-1])).astype(np.float32)
        sig_band = compute_sig_band(bps, levels, bhw=5)
        seq_band = convert_to_seq_band(sig_band)
        adjust_seq_band(seq_band)
        reads.append((signal, levels, seq_band))
        _s, p, _t, _o = host_dp.seq_banded_dp(
            signal, levels, seq_band, sdp, algo
        )
        host_paths.append(p)
    dev_paths = refine_batch(reads, sdp, algo=algo)
    for hp, dp_ in zip(host_paths, dev_paths):
        assert np.array_equal(hp, dp_)


def test_device_enc_kmers_matches_host():
    rng = np.random.default_rng(5)
    for _ in range(10):
        B = int(rng.integers(1, 8))
        S = int(rng.integers(4, 30))
        bb, ab = int(rng.integers(0, 5)), int(rng.integers(0, 5))
        W = int(rng.integers(10, 80))
        seq_lens = rng.integers(2, S + 1, B).astype(np.int16)
        seqs = rng.integers(-1, 4, (B, S + bb + ab)).astype(np.int8)
        maps = np.zeros((B, S + 1), dtype=np.int16)
        for b in range(B):
            sl = seq_lens[b]
            maps[b, 1:sl] = np.sort(rng.integers(0, W + 1, sl - 1))
            maps[b, sl] = W
            maps[b, sl + 1 :] = rng.integers(-50, 50, S - sl)
        h = host_enc(bb, ab, seqs, maps, seq_lens)
        d = np.asarray(dev_enc(bb, ab, seqs, maps, seq_lens, W))
        assert np.array_equal(h, d)


@pytest.mark.parametrize("algo", ["Viterbi", "dwell_penalty"])
def test_pallas_dp_matches_host(algo):
    """Pallas single-launch DP kernels, path-exact vs the oracle
    (interpret mode on CPU; the real-TPU run is exercised by
    benchmarks/bench_dp.py --pallas)."""
    rng = np.random.default_rng(11)
    sdp = compute_dwell_pen_array(4, 3, 0.5)
    reads, host_paths = [], []
    for _ in range(4):
        seq_len = int(rng.integers(8, 30))
        spb = rng.integers(1, 8, seq_len)
        bps = np.concatenate([[0], np.cumsum(spb)]).astype(np.int64)
        levels = rng.normal(size=seq_len).astype(np.float32)
        signal = rng.normal(size=int(bps[-1])).astype(np.float32)
        sig_band = compute_sig_band(bps, levels, bhw=3)
        seq_band = convert_to_seq_band(sig_band)
        adjust_seq_band(seq_band)
        reads.append((signal, levels, seq_band))
        _s, p, _t, _o = host_dp.seq_banded_dp(
            signal, levels, seq_band, sdp, algo
        )
        host_paths.append(p)
    dev_paths = refine_batch_pallas(reads, sdp, algo=algo, interpret=True)
    for hp, dp_ in zip(host_paths, dev_paths):
        assert np.array_equal(hp, dp_)


@pytest.mark.parametrize("algo", ["Viterbi", "dwell_penalty"])
def test_pallas_dp_heterogeneous_band_widths(algo):
    """Lanes with wildly different band widths in ONE launch: the
    per-base dynamic fold bound (max w across lanes) must leave every
    narrow lane's scores exact while wide lanes fold further; rows past
    the bound hold stale scratch that must never leak into a path."""
    rng = np.random.default_rng(23)
    sdp = compute_dwell_pen_array(4, 3, 0.5)
    reads, host_paths = [], []
    # samples-per-base regimes: uniform-short, one long stall, mixed
    for kind in range(6):
        seq_len = int(rng.integers(10, 24))
        if kind % 3 == 0:
            spb = rng.integers(1, 5, seq_len)
        elif kind % 3 == 1:
            spb = rng.integers(1, 5, seq_len)
            spb[seq_len // 2] = 220  # one long stall -> one wide band
        else:
            spb = rng.integers(1, 40, seq_len)
        bps = np.concatenate([[0], np.cumsum(spb)]).astype(np.int64)
        levels = rng.normal(size=seq_len).astype(np.float32)
        signal = rng.normal(size=int(bps[-1])).astype(np.float32)
        sig_band = compute_sig_band(bps, levels, bhw=5)
        seq_band = convert_to_seq_band(sig_band)
        adjust_seq_band(seq_band)
        reads.append((signal, levels, seq_band))
        _s, p, _t, _o = host_dp.seq_banded_dp(
            signal, levels, seq_band, sdp, algo
        )
        host_paths.append(p)
    widths = [int((sb[1] - sb[0]).max()) for _s, _l, sb in reads]
    assert max(widths) > 4 * min(widths), widths  # the point of the test
    dev_paths = refine_batch_pallas(reads, sdp, algo=algo, interpret=True)
    for hp, dp_ in zip(host_paths, dev_paths):
        assert np.array_equal(hp, dp_)


def test_conv_bn_swish_pallas_backward_parity():
    """The fused Pallas conv+BN+swish backward (kernels/pallas_convbn)
    matches an f64 NumPy oracle of the same math at least as closely as
    the XLA custom-VJP path does (both are f32 reassociations of one
    formula; the oracle separates rounding noise on near-cancelling
    sums from genuine kernel bugs like roll contamination)."""
    import jax
    import jax.numpy as jnp

    from remora_tpu.models import layers as L

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
    for B, T, I, O, K in ((8, 40, 16, 32, 5), (4, 30, 4, 8, 3)):
        conv_p = L.conv1d_init(k1, I, O, K)
        bn_p, _ = L.batchnorm_init(O)
        state = {
            "mean": jnp.linspace(-1.0, 1.0, O),
            "var": jnp.linspace(0.5, 2.0, O),
        }
        x = jax.random.normal(k2, (B, T, I))
        To = T - K + 1
        probe = jax.random.normal(k3, (B, To, O))

        def run(which):
            def f(cp, bp, xx):
                out, ns = L.conv_bn_swish(
                    cp, bp, state, xx, stride=1, train=True, impl=which
                )
                return jnp.sum(out * probe), (out, ns)

            (loss, (out, ns)), grads = jax.value_and_grad(
                f, argnums=(0, 1, 2), has_aux=True
            )(conv_p, bn_p, x)
            return loss, out, ns, grads

        l0, o0, s0, g0 = run("fused")
        l1, o1, s1, g1 = run("pallas")
        assert float(jnp.max(jnp.abs(o0 - o1))) == 0.0  # same forward
        for key in ("mean", "var"):
            assert float(jnp.max(jnp.abs(s0[key] - s1[key]))) == 0.0

        # ---- f64 oracle of the identical backward formulas ----
        xw = np.asarray(x, np.float64)
        w64 = np.asarray(conv_p["w"], np.float64)  # (O, I, K)
        g64 = np.asarray(bn_p["gamma"], np.float64)
        b64 = np.asarray(bn_p["beta"], np.float64)
        dout = np.asarray(probe, np.float64)
        y = np.zeros((B, To, O))
        for k in range(K):
            y += np.einsum("bti,oi->bto", xw[:, k : k + To, :], w64[:, :, k])
        mu = y.mean((0, 1))
        var = y.var((0, 1))
        r = 1.0 / np.sqrt(var + 1e-5)
        xhat = (y - mu) * r
        z = g64 * xhat + b64
        s = 1.0 / (1.0 + np.exp(-z))
        dz = dout * (s + z * s * (1.0 - s))
        dgamma = (dz * xhat).sum((0, 1))
        dbeta = dz.sum((0, 1))
        n = B * To
        dy = (g64 * r) * (dz - dbeta / n - xhat * (dgamma / n))
        db = dy.sum((0, 1))
        dw = np.zeros_like(w64)
        dx = np.zeros_like(xw)
        for k in range(K):
            dw[:, :, k] = np.einsum(
                "bto,bti->oi", dy, xw[:, k : k + To, :]
            )
            dx[:, k : k + To, :] += np.einsum("bto,oi->bti", dy, w64[:, :, k])
        oracle = {
            "conv_w": dw, "conv_b": db, "gamma": dgamma, "beta": dbeta,
            "x": dx,
        }
        got = {
            "conv_w": (g0[0]["w"], g1[0]["w"]),
            "conv_b": (g0[0]["b"], g1[0]["b"]),
            "gamma": (g0[1]["gamma"], g1[1]["gamma"]),
            "beta": (g0[1]["beta"], g1[1]["beta"]),
            "x": (g0[2], g1[2]),
        }
        for name, ref in oracle.items():
            e_fused = float(np.max(np.abs(np.asarray(got[name][0]) - ref)))
            e_pal = float(np.max(np.abs(np.asarray(got[name][1]) - ref)))
            # the kernel may not be more than ~4x noisier than XLA's own
            # f32 rounding against the f64 truth (same-formula check)
            assert e_pal <= 4.0 * e_fused + 1e-6, (
                name, e_pal, e_fused
            )
