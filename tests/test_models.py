"""Model parity tests: JAX forward vs a torch execution of the exported
architecture, plus layer-level semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from remora_tpu.models import conv_lstm_model, conv_model
from remora_tpu.models import layers as L
from remora_tpu.models import model_io


def _torch_forward(params, bn_state, meta_params, is_lstm, sigs, seqs):
    import torch

    from remora_tpu.models.export import _build_torch_module

    meta = {"model_params": meta_params}
    model = conv_lstm_model if is_lstm else conv_model
    net = _build_torch_module(model, params, bn_state, meta)
    with torch.no_grad():
        return net(
            torch.from_numpy(sigs), torch.from_numpy(seqs)
        ).numpy()


@pytest.mark.parametrize(
    "model,is_lstm,width",
    [(conv_lstm_model, True, 400), (conv_model, False, 100)],
)
def test_torch_parity(model, is_lstm, width):
    size, kmer_len, num_out = 16, 9, 2
    params, bn_state = model.init(
        jax.random.PRNGKey(0), size=size, kmer_len=kmer_len, num_out=num_out
    )
    rng = np.random.default_rng(0)
    sigs = rng.normal(size=(4, 1, width)).astype(np.float32)
    seqs = (rng.random((4, 4 * kmer_len, width)) < 0.25).astype(np.float32)
    j_out, _ = model.forward(params, bn_state, sigs, seqs, train=False)
    t_out = _torch_forward(
        params,
        bn_state,
        {"size": size, "kmer_len": kmer_len, "num_out": num_out},
        is_lstm,
        sigs,
        seqs,
    )
    assert np.allclose(np.asarray(j_out), t_out, atol=2e-5)


def test_lstm_matches_torch():
    import torch

    H, T, B = 8, 12, 3
    params = L.lstm_init(jax.random.PRNGKey(1), H, H)
    t_lstm = torch.nn.LSTM(H, H, 1)
    sd = {
        "weight_ih_l0": torch.from_numpy(np.asarray(params["w_ih"])),
        "weight_hh_l0": torch.from_numpy(np.asarray(params["w_hh"])),
        "bias_ih_l0": torch.from_numpy(np.asarray(params["b_ih"])),
        "bias_hh_l0": torch.from_numpy(np.asarray(params["b_hh"])),
    }
    t_lstm.load_state_dict(sd)
    x = np.random.default_rng(2).normal(size=(T, B, H)).astype(np.float32)
    with torch.no_grad():
        t_out = t_lstm(torch.from_numpy(x))[0].numpy()
    j_out = np.asarray(L.lstm(params, jnp.asarray(x)))
    assert np.allclose(j_out, t_out, atol=1e-6)
    # reverse direction == flip-run-flip
    j_rev = np.asarray(L.lstm(params, jnp.asarray(x), reverse=True))
    with torch.no_grad():
        t_rev = torch.flip(
            t_lstm(torch.flip(torch.from_numpy(x), (0,)))[0], (0,)
        ).numpy()
    assert np.allclose(j_rev, t_rev, atol=1e-6)
    # zero-state single cell step == first output of a length-1 sequence
    h1 = np.asarray(L.lstm_cell_step0(params, jnp.asarray(x[0])))
    assert np.allclose(h1, t_out[0] if T == 1 else
                       t_lstm(torch.from_numpy(x[:1]))[0][0].detach().numpy(),
                       atol=1e-6)


def test_batchnorm_matches_torch():
    import torch

    C = 6
    params, state = L.batchnorm_init(C)
    t_bn = torch.nn.BatchNorm1d(C)
    x = np.random.default_rng(3).normal(size=(4, C, 20)).astype(np.float32)
    # the jax layer is channels-last (B, T, C); torch BN1d is (B, C, T)
    x_tc = jnp.asarray(np.ascontiguousarray(x.transpose(0, 2, 1)))
    # train mode
    t_bn.train()
    t_out = t_bn(torch.from_numpy(x)).detach().numpy()
    j_out, new_state = L.batchnorm(params, state, x_tc, train=True)
    j_out = np.asarray(j_out).transpose(0, 2, 1)
    assert np.allclose(j_out, t_out, atol=1e-5)
    assert np.allclose(
        np.asarray(new_state["mean"]), t_bn.running_mean.numpy(), atol=1e-6
    )
    assert np.allclose(
        np.asarray(new_state["var"]), t_bn.running_var.numpy(), atol=1e-5
    )
    # eval mode with updated stats
    t_bn.eval()
    t_out = t_bn(torch.from_numpy(x)).detach().numpy()
    j_out, _ = L.batchnorm(params, new_state, x_tc, train=False)
    assert np.allclose(
        np.asarray(j_out).transpose(0, 2, 1), t_out, atol=1e-5
    )


def test_checkpoint_roundtrip(tmp_path):
    from remora_tpu.data.metadata import DatasetMetadata

    params, bn_state = conv_lstm_model.init(
        jax.random.PRNGKey(0), size=8, kmer_len=3, num_out=2
    )
    md = DatasetMetadata(
        allocate_size=1,
        max_seq_len=10,
        mod_bases=["m"],
        mod_long_names=["5mC"],
        motif_sequences=["CG"],
        motif_offsets=[0],
        chunk_context=(50, 50),
        kmer_context_bases=(1, 1),
    )
    meta, arrays = model_io.make_model_metadata(
        md, "ConvLSTM_w_ref", {"size": 8, "kmer_len": 3, "num_out": 2}
    )
    path = tmp_path / "m.npz"
    model_io.save_model(path, params, bn_state, meta, arrays)
    model2, p2, b2, meta2 = model_io.load_model(path)
    assert meta2["motifs"] == [("CG", 0)]
    assert meta2["chunk_context"] == (50, 50)
    for k in params:
        for kk in params[k]:
            assert np.array_equal(
                np.asarray(params[k][kk]), np.asarray(p2[k][kk])
            )


@pytest.mark.parametrize("impl", ["remat", "fused", "fused_resid", "packed"])
def test_conv_bn_swish_impl_parity(impl):
    """The fused/remat conv+BN+swish blocks match the plain path:
    outputs, running-state update, and every gradient (remat exactly;
    fused/fused_resid to fp-rounding — they reassociate the bias/stat
    arithmetic; fused_resid additionally reads a saved xhat residual in
    backward instead of recomputing the conv)."""
    rng = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(rng)
    conv_p = L.conv1d_init(k1, 16, 32, 9)
    bn_p, _ = L.batchnorm_init(32)
    state = {
        "mean": jnp.linspace(-1.0, 1.0, 32),
        "var": jnp.linspace(0.5, 2.0, 32),
    }
    x = jax.random.normal(k2, (16, 64, 16))  # channels-last (B, T, C)

    def run(which):
        def f(cp, bp, xx):
            out, ns = L.conv_bn_swish(
                cp, bp, state, xx, stride=3, train=True, impl=which
            )
            return jnp.mean(out ** 2), (out, ns)

        (loss, (out, ns)), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2), has_aux=True
        )(conv_p, bn_p, x)
        return loss, out, ns, grads

    l0, o0, s0, g0 = run("plain")
    l1, o1, s1, g1 = run(impl)
    # remat re-derives the same math (ULP-level fusion differences
    # only); fused reassociates the bias/stat arithmetic
    tol = 1e-6 if impl == "remat" else 1e-5  # fused*/packed reassociate
    assert abs(float(l0 - l1)) <= tol
    assert float(jnp.max(jnp.abs(o0 - o1))) <= tol
    for key in ("mean", "var"):
        assert float(jnp.max(jnp.abs(s0[key] - s1[key]))) <= tol
    leaves0 = jax.tree_util.tree_leaves(g0)
    leaves1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(leaves0, leaves1):
        scale = float(jnp.max(jnp.abs(a))) + 1e-3
        assert float(jnp.max(jnp.abs(a - b))) <= max(tol * scale, tol)


def test_train_step_multi_launch_matches_singles():
    """K steps in one scanned launch == K sequential single-step
    launches, bit-identical (params, BN state, per-step losses)."""
    from remora_tpu.train.optim import TrainOpts
    from remora_tpu.train.train import (
        make_train_step_raw,
        make_train_step_raw_multi,
    )

    M = conv_lstm_model
    B, W, K, S, KS = 32, 100, 5, 20, 3
    params, bn = M.init(jax.random.PRNGKey(0), size=8, kmer_len=K,
                        num_out=2)
    tx = TrainOpts().load_optimizer()
    opt = tx.init(params)
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.normal(size=(KS, B, 1, W)).astype(np.float32))
    lens = rng.integers(S // 2, S + 1, (KS, B)).astype(np.int16)
    seqs = jnp.asarray(
        rng.integers(0, 4, (KS, B, S + K - 1)).astype(np.int8)
    )
    maps = np.zeros((KS, B, S + 1), np.int16)
    for k in range(KS):
        for b in range(B):
            sl = lens[k, b]
            maps[k, b, 1:sl] = np.sort(rng.integers(0, W + 1, sl - 1))
            maps[k, b, sl] = W
    maps = jnp.asarray(maps)
    lens_j = jnp.asarray(lens)
    labels = jnp.asarray(rng.integers(0, 2, (KS, B)).astype(np.int64))
    bb = K // 2

    single = make_train_step_raw(M, tx, (bb, K - 1 - bb), W, donate=False)
    multi = make_train_step_raw_multi(
        M, tx, (bb, K - 1 - bb), W, KS, donate=False
    )

    p, s, o = params, bn, opt
    losses = []
    for k in range(KS):
        p, s, o, loss, _nf, _gm = single(
            p, s, o, sig[k], seqs[k], maps[k], lens_j[k], labels[k]
        )
        losses.append(float(loss))
    p2, s2, _o2, lm, _nf2, _gm2 = multi(
        params, bn, opt, sig, seqs, maps, lens_j, labels
    )
    # the scan body and the standalone step are separate XLA programs;
    # fusion choices differ at ULP level, so assert to 1e-6 not
    # bit-equal. Exception: conv biases under BatchNorm have exactly-
    # zero true gradients — their computed grads are fp noise, and Adam
    # normalizes noise to lr-scale updates, so ULP input differences
    # legitimately drift those few leaves by ~lr per step.
    assert np.allclose(np.asarray(lm, np.float32),
                       np.asarray(losses, np.float32), atol=1e-6)
    noise_leaves = {
        (name, "b") for name in p if "conv" in name
    }
    for kp, a in jax.tree_util.tree_leaves_with_path(p):
        b = p2
        for part in kp:
            b = b[part.key]
        key = tuple(part.key for part in kp)
        # Adam's rsqrt(second-moment) normalization amplifies ULP-level
        # grad differences on small-magnitude grads; after 3 steps 1e-4
        # still sits orders below any semantic divergence
        tol = 1e-2 if key in noise_leaves else 1e-4
        assert np.allclose(np.asarray(a), np.asarray(b), atol=tol), key
    # running means absorb the drifted conv biases (mu + b), so the BN
    # state inherits the same amplified-noise tolerance
    for a, b in zip(jax.tree_util.tree_leaves(s),
                    jax.tree_util.tree_leaves(s2)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_train_step_multi_launch_clip_and_filter():
    """Multi-step launch with grad clipping AND high-conf-incorrect
    filtering: per-step losses/filter counts match sequential single
    steps (thresholds fixed across both, as within a launch window)."""
    from remora_tpu.train.optim import TrainOpts
    from remora_tpu.train.train import (
        make_train_step_raw,
        make_train_step_raw_multi,
    )

    M = conv_lstm_model
    B, W, K, S, KS = 32, 100, 5, 20, 2
    params, bn = M.init(jax.random.PRNGKey(1), size=8, kmer_len=K,
                        num_out=2)
    tx = TrainOpts().load_optimizer()
    opt = tx.init(params)
    rng = np.random.default_rng(1)
    sig = jnp.asarray(rng.normal(size=(KS, B, 1, W)).astype(np.float32))
    lens = rng.integers(S // 2, S + 1, (KS, B)).astype(np.int16)
    seqs = jnp.asarray(
        rng.integers(0, 4, (KS, B, S + K - 1)).astype(np.int8)
    )
    maps = np.zeros((KS, B, S + 1), np.int16)
    for k in range(KS):
        for b in range(B):
            sl = lens[k, b]
            maps[k, b, 1:sl] = np.sort(rng.integers(0, W + 1, sl - 1))
            maps[k, b, sl] = W
    maps = jnp.asarray(maps)
    lens_j = jnp.asarray(lens)
    labels = jnp.asarray(rng.integers(0, 2, (KS, B)).astype(np.int64))
    bb = K // 2
    kw = dict(
        high_conf_incorrect_thr_frac=(0.4, 0.5),
        use_grad_clip=True,
        donate=False,
    )
    threshs = jax.tree.map(lambda p: jnp.full((), 0.05, jnp.float32),
                           params)

    single = make_train_step_raw(M, tx, (bb, K - 1 - bb), W, **kw)
    multi = make_train_step_raw_multi(M, tx, (bb, K - 1 - bb), W, KS, **kw)

    p, s, o = params, bn, opt
    losses, filts = [], []
    for k in range(KS):
        p, s, o, loss, n_filt, _gm = single(
            p, s, o, sig[k], seqs[k], maps[k], lens_j[k], labels[k],
            threshs,
        )
        losses.append(float(loss))
        filts.append(int(n_filt))
    _p2, _s2, _o2, lm, nf, gm = multi(
        params, bn, opt, sig, seqs, maps, lens_j, labels, threshs
    )
    assert np.allclose(np.asarray(lm), np.asarray(losses, np.float32),
                       atol=1e-6)
    assert np.array_equal(np.asarray(nf), np.asarray(filts))
    assert jax.tree_util.tree_leaves(gm)[0].shape == (KS,)
