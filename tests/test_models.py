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
    # train mode
    t_bn.train()
    t_out = t_bn(torch.from_numpy(x)).detach().numpy()
    j_out, new_state = L.batchnorm(params, state, jnp.asarray(x), train=True)
    assert np.allclose(np.asarray(j_out), t_out, atol=1e-5)
    assert np.allclose(
        np.asarray(new_state["mean"]), t_bn.running_mean.numpy(), atol=1e-6
    )
    assert np.allclose(
        np.asarray(new_state["var"]), t_bn.running_var.numpy(), atol=1e-5
    )
    # eval mode with updated stats
    t_bn.eval()
    t_out = t_bn(torch.from_numpy(x)).detach().numpy()
    j_out, _ = L.batchnorm(params, new_state, jnp.asarray(x), train=False)
    assert np.allclose(np.asarray(j_out), t_out, atol=1e-5)


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
