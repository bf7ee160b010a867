"""Dorado export validated against the exec-loaded REFERENCE exporter.

Loads the reference's ``export_model_dorado``
(``/root/reference/src/remora/model_util.py:179-309``) by AST — torch is
installed, so the real function runs — feeds it the SAME checkpoint
(via the torch module reconstruction the TorchScript exporter already
uses), and compares the produced directory against
``models/export.py::export_model_dorado``:

  * identical file sets
  * every ``.tensor`` numerically equal (incl. the conv+BN fused
    weights: reference path uses ``torch.nn.utils.fusion``; ours folds
    on the JAX pytree)
  * config.toml sections/keys/values match the metadata dict the
    reference code itself constructed (captured from its toml.dump
    call — the ``toml`` package is not installed here)
"""

import ast
import datetime
import os

import numpy as np
import pytest
import tomllib

from remora_tpu import RemoraError

REF_MODEL_UTIL = "/root/reference/src/remora/model_util.py"


class _SilentLogger:
    def __getattr__(self, name):
        return lambda *a, **k: None


class _TomlCapture:
    """Stands in for the (uninstalled) ``toml`` module; records the
    metadata dict the reference exporter builds."""

    def __init__(self):
        self.captured = None

    def dump(self, data, fh):
        self.captured = data


def load_reference_exporter():
    with open(REF_MODEL_UTIL) as fh:
        tree = ast.parse(fh.read())
    fn = next(
        node
        for node in tree.body
        if isinstance(node, ast.FunctionDef)
        and node.name == "export_model_dorado"
    )
    import torch
    from torch import nn
    from torch.nn.utils.fusion import fuse_conv_bn_eval

    toml = _TomlCapture()
    ns = {
        "torch": torch,
        "nn": nn,
        "np": np,
        "os": os,
        "datetime": datetime,
        "LOGGER": _SilentLogger(),
        "RemoraError": RemoraError,
        "fuse_conv_bn_eval": fuse_conv_bn_eval,
        "toml": toml,
    }
    mod = ast.Module(body=[fn], type_ignores=[])
    exec(compile(mod, REF_MODEL_UTIL, "exec"), ns)
    return ns["export_model_dorado"], toml


class _RefinerAdapter:
    """Expose the repo refiner under the reference's attribute names."""

    def __init__(self, smr):
        self.do_rough_rescale = smr.do_rough_rescale
        self.center_idx = getattr(smr, "center_idx", None)
        self._levels_array = smr.levels_array


@pytest.fixture(scope="module")
def lstm_checkpoint(tmpdir_factory, chunks_config):
    from remora_tpu.train.optim import TrainOpts
    from remora_tpu.train.train import train_model

    out = tmpdir_factory.mktemp("dorado_parity_train")
    train_model(
        seed=7,
        out_path=str(out),
        remora_dataset_path=str(chunks_config),
        chunk_context=(50, 50),
        kmer_context_bases=(2, 2),
        batch_size=32,
        model_name="ConvLSTM_w_ref",
        size=16,
        train_opts=TrainOpts(epochs=1, early_stopping=0),
        chunks_per_epoch=64,
        num_test_chunks=32,
    )
    return os.path.join(str(out), "model_final.checkpoint")


def _load_tensor(path):
    import torch

    m = torch.jit.load(path)
    (param,) = [p for _n, p in m.named_parameters()]
    return param.detach().numpy()


def test_dorado_export_matches_reference_exporter(
    lstm_checkpoint, tmp_path
):
    from remora_tpu.models import model_io
    from remora_tpu.models.export import (
        _build_torch_module,
        export_model_dorado,
    )

    repo_dir = tmp_path / "repo_export"
    export_model_dorado(lstm_checkpoint, str(repo_dir))

    # reference exporter on the SAME checkpoint via the reconstructed
    # torch module + a ckpt dict shaped like the reference's
    ref_export, toml_capture = load_reference_exporter()
    model, params, bn_state, meta = model_io.load_model(lstm_checkpoint)
    net = _build_torch_module(model, params, bn_state, meta)
    ckpt = {
        "sig_map_refiner": _RefinerAdapter(meta["sig_map_refiner"]),
        "mod_bases": "".join(meta["mod_bases"]) or None,
        "offset": meta["offset"],
        "reverse_signal": meta["reverse_signal"],
        "pa_scaling": meta["pa_scaling"],
        "mod_long_names": meta["mod_long_names"],
        "chunk_context": meta["chunk_context"],
        "kmer_context_bases": meta["kmer_context_bases"],
        "motifs": meta["motifs"],
        "model_params": meta["model_params"],
    }
    ref_dir = tmp_path / "ref_export"
    ref_export(ckpt, net, str(ref_dir))

    # 1) identical directory structure
    repo_files = set(os.listdir(repo_dir))
    ref_files = set(os.listdir(ref_dir))
    assert repo_files == ref_files

    # 2) every tensor numerically equal (fused convs included)
    tensor_files = sorted(f for f in ref_files if f.endswith(".tensor"))
    assert any(f.startswith("merge_conv1") for f in tensor_files)
    for fn in tensor_files:
        ref_arr = _load_tensor(str(ref_dir / fn))
        got_arr = _load_tensor(str(repo_dir / fn))
        assert got_arr.shape == ref_arr.shape, fn
        np.testing.assert_allclose(
            got_arr, ref_arr, rtol=1e-5, atol=1e-6, err_msg=fn
        )

    # 3) config.toml matches the metadata dict the reference built
    ref_meta = toml_capture.captured
    assert ref_meta is not None
    with open(repo_dir / "config.toml", "rb") as fh:
        got_meta = tomllib.load(fh)
    assert set(got_meta) == set(ref_meta)
    assert got_meta["general"]["model"] == ref_meta["general"]["model"]

    def normalize(v):
        if isinstance(v, tuple):
            return list(v)
        if v is None:
            return ""
        return v

    for section in ("model_params", "modbases", "refinement"):
        ref_sec = {k: normalize(v) for k, v in ref_meta[section].items()}
        got_sec = {k: normalize(v) for k, v in got_meta[section].items()}
        assert got_sec == ref_sec, section
