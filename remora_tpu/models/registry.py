"""Model registry + custom architecture loading.

Built-in architectures mirror the reference's two model files; custom
models load from a user .py file exposing ``init(rng, size, kmer_len,
num_out) -> (params, bn_state)`` and ``forward(params, bn_state, sigs,
seqs, train) -> (logits, new_bn_state)`` (reference analog:
``model_util._load_python_model``).
"""

import importlib.machinery
import importlib.util

from remora_tpu import RemoraError
from remora_tpu.models import conv_lstm_model, conv_model

BUILTIN_MODELS = {
    "ConvLSTM_w_ref": conv_lstm_model,
    "Conv_w_ref": conv_model,
}


def get_model(name_or_path):
    """Resolve a model module by builtin name or python file path."""
    if name_or_path in BUILTIN_MODELS:
        return BUILTIN_MODELS[name_or_path]
    if str(name_or_path).endswith(".py"):
        return load_python_model(name_or_path)
    raise RemoraError(
        f"Unknown model {name_or_path!r}; builtins: "
        f"{', '.join(BUILTIN_MODELS)}"
    )


def load_python_model(model_file):
    """Exec-load a model definition module from a file path.

    Accepts either a native remora_tpu model module (init/forward) or a
    reference-style torch module file (detected by a ``network`` class),
    which is adapted via the torch bridge.
    """
    loader = importlib.machinery.SourceFileLoader("netmodule", str(model_file))
    spec = importlib.util.spec_from_loader(loader.name, loader)
    netmodule = importlib.util.module_from_spec(spec)
    loader.exec_module(netmodule)
    if hasattr(netmodule, "init") and hasattr(netmodule, "forward"):
        return netmodule
    if hasattr(netmodule, "network"):
        # reference-style torch architecture file: match by layer names
        return _adapt_reference_model(netmodule, model_file)
    raise RemoraError(
        f"Model file {model_file} defines neither (init, forward) nor a "
        "torch 'network' class"
    )


def _adapt_reference_model(netmodule, model_file):
    """Map a reference torch model file onto a builtin JAX architecture.

    The two reference architectures are identified by their layer sets;
    arbitrary novel torch architectures are not auto-translated.
    """
    import torch

    net = netmodule.network(size=8, kmer_len=3, num_out=2)
    layer_names = {n.split(".")[0] for n, _ in net.named_parameters()}
    if "lstm1" in layer_names:
        return conv_lstm_model
    if "merge_conv4" in layer_names:
        return conv_model
    raise RemoraError(
        f"Cannot map torch architecture in {model_file} to a builtin "
        "remora_tpu model"
    )
