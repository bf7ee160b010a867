"""Model artifact I/O: native checkpoints + reference TorchScript import.

Native format is a single ``.npz``: flattened param/bn arrays plus a
JSON metadata payload — the same travel-with-the-model metadata contract
as the reference (``model_util.py:115–176``), so chunk extraction at
inference exactly matches data preparation.

Reference TorchScript models (with their ``meta.txt`` extra file) are
imported losslessly: state_dict tensors map 1:1 onto the JAX param
pytree (``model_util.py:468–563`` analog, plus ``add_derived_metadata``
semantics including cp437-encoded refine arrays).
"""

import io
import json

import numpy as np

from remora_tpu import RemoraError, constants, log
from remora_tpu.models.registry import BUILTIN_MODELS, get_model
from remora_tpu.refine.refiner import SigMapRefiner

LOGGER = log.get_logger()


# ---------------- param pytree <-> flat arrays ----------------


def flatten_tree(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(flatten_tree(v, prefix=f"{key}/"))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_tree(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


# ---------------- metadata ----------------


def make_model_metadata(dataset_metadata, model_name, model_params):
    """Assemble the checkpoint metadata dict from dataset metadata."""
    md = dataset_metadata
    meta = {
        "model_name": model_name,
        "model_params": dict(model_params),
        "model_version": constants.MODEL_VERSION,
        "chunk_context": list(md.chunk_context),
        "motifs": [list(m) for m in md.motifs],
        "num_motifs": md.num_motifs,
        "reverse_signal": md.reverse_signal,
        "mod_bases": list(md.mod_bases),
        "mod_long_names": list(md.mod_long_names),
        "modified_base_labels": md.modified_base_labels,
        "kmer_context_bases": list(md.kmer_context_bases),
        "base_start_justify": md.base_start_justify,
        "offset": md.offset,
        "pa_scaling": (
            None if md.pa_scaling is None else list(md.pa_scaling)
        ),
    }
    smr = md.sig_map_refiner
    refine = (smr or SigMapRefiner()).asdict()
    # levels/sd arrays ride as npz arrays, the rest as JSON scalars
    meta["refine_kmer_center_idx"] = int(refine["refine_kmer_center_idx"])
    meta["refine_do_rough_rescale"] = bool(refine["refine_do_rough_rescale"])
    meta["refine_scale_iters"] = int(refine["refine_scale_iters"])
    meta["refine_algo"] = refine["refine_algo"]
    meta["refine_half_bandwidth"] = int(refine["refine_half_bandwidth"])
    meta["rough_rescale_method"] = refine["rough_rescale_method"]
    arrays = {}
    if refine["refine_kmer_levels"] is not None:
        arrays["refine_kmer_levels"] = np.asarray(
            refine["refine_kmer_levels"], np.float32
        )
    arrays["refine_sd_arr"] = np.asarray(refine["refine_sd_arr"], np.float32)
    return meta, arrays


def add_derived_metadata(meta):
    """Populate derived fields used throughout inference."""
    meta.setdefault("reverse_signal", False)
    meta.setdefault("pa_scaling", None)
    meta["kmer_context_bases"] = tuple(meta["kmer_context_bases"])
    meta["chunk_context"] = tuple(meta["chunk_context"])
    meta["kmer_len"] = sum(meta["kmer_context_bases"]) + 1
    meta["chunk_len"] = sum(meta["chunk_context"])
    meta["motifs"] = [(str(m), int(o)) for m, o in meta["motifs"]]
    meta["can_base"] = meta["motifs"][0][0][meta["motifs"][0][1]]
    if len(meta["motifs"]) == 1:
        meta["motif"] = meta["motifs"][0]
    else:
        meta["motif"] = (meta["can_base"], 0)
    if meta.get("pa_scaling") is not None:
        meta["pa_scaling"] = tuple(meta["pa_scaling"])
    if meta.get("mod_bases") is None:
        meta["mod_bases"] = []
        meta["mod_long_names"] = []
    mod_str = "; ".join(
        f"{b}={ln}"
        for b, ln in zip(meta["mod_bases"], meta["mod_long_names"])
    )
    meta["alphabet_str"] = (
        f"loaded modified base model to call (alt to {meta['can_base']}): "
        f"{mod_str}"
    )
    levels = meta.pop("refine_kmer_levels", None)
    sd_arr = meta.pop("refine_sd_arr", None)
    meta["sig_map_refiner"] = SigMapRefiner(
        _levels_array=None if levels is None else np.asarray(levels, np.float32),
        center_idx=int(meta.pop("refine_kmer_center_idx", -1)),
        do_rough_rescale=bool(meta.pop("refine_do_rough_rescale", False)),
        scale_iters=int(meta.pop("refine_scale_iters", -1)),
        algo=meta.pop("refine_algo", constants.DEFAULT_REFINE_ALGO),
        half_bandwidth=int(
            meta.pop("refine_half_bandwidth", constants.DEFAULT_REFINE_HBW)
        ),
        sd_arr=(
            None if sd_arr is None else np.asarray(sd_arr, np.float32)
        ),
        rough_rescale_method=meta.pop(
            "rough_rescale_method", constants.ROUGH_RESCALE_LEAST_SQUARES
        ),
    )
    return meta


# ---------------- native save/load ----------------


def save_model(path, params, bn_state, meta, meta_arrays=None, opt_state=None):
    """Write a single-file .npz model artifact.

    ``opt_state`` may be any optax state pytree; its leaves are stored in
    flattened order and restored into a freshly initialized state of the
    same optimizer (see ``load_opt_state``).
    """
    payload = {"__meta__": np.frombuffer(
        json.dumps(meta, default=_json_default).encode(), dtype=np.uint8
    )}
    payload.update(
        {f"params/{k}": v for k, v in flatten_tree(params).items()}
    )
    payload.update(
        {f"bn/{k}": v for k, v in flatten_tree(bn_state).items()}
    )
    if meta_arrays:
        payload.update({f"meta_arr/{k}": v for k, v in meta_arrays.items()})
    if opt_state is not None:
        import jax

        leaves = jax.tree_util.tree_leaves(opt_state)
        for i, leaf in enumerate(leaves):
            payload[f"opt_leaf/{i:05d}"] = np.asarray(leaf)
    with open(path, "wb") as fh:
        np.savez(fh, **payload)


def _json_default(obj):
    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    raise TypeError(f"Cannot serialize {type(obj)}")


def load_model(path, quiet=True, model_path=None):
    """Load any supported model artifact.

    Returns (model_module, params, bn_state, metadata) — metadata has all
    derived fields set (kmer_len, chunk_len, can_base, sig_map_refiner...).
    ``model_path`` overrides the architecture recorded in the checkpoint
    (a builtin name or a model .py file).
    """
    path = str(path)
    if path.endswith((".pt", ".ts")):
        if model_path is not None:
            LOGGER.warning(
                "--model-path is ignored for TorchScript artifacts "
                "(the architecture is embedded in the program)"
            )
        return load_torchscript_model(path, quiet=quiet)
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode())
    params = unflatten_tree(
        {
            k[len("params/") :]: data[k]
            for k in data.files
            if k.startswith("params/")
        }
    )
    bn_state = unflatten_tree(
        {k[len("bn/") :]: data[k] for k in data.files if k.startswith("bn/")}
    )
    for k in data.files:
        if k.startswith("meta_arr/"):
            meta[k[len("meta_arr/") :]] = data[k]
    meta = add_derived_metadata(meta)
    model = get_model(
        model_path or meta.get("model_name", "ConvLSTM_w_ref")
    )
    if not quiet:
        LOGGER.debug(f"Loaded model metadata:\n{repr_model_metadata(meta)}")
    return model, params, bn_state, meta


def load_opt_state(path, template_state):
    """Restore optimizer state saved by ``save_model`` into the structure
    of ``template_state`` (a freshly initialized state of the SAME
    optimizer over the same params)."""
    import jax

    data = np.load(path, allow_pickle=False)
    keys = sorted(k for k in data.files if k.startswith("opt_leaf/"))
    if not keys:
        return None
    leaves = [data[k] for k in keys]
    treedef = jax.tree_util.tree_structure(template_state)
    if treedef.num_leaves != len(leaves):
        raise RemoraError(
            "Optimizer state in checkpoint does not match the configured "
            f"optimizer ({treedef.num_leaves} leaves expected, "
            f"{len(leaves)} stored)"
        )
    template_leaves = jax.tree_util.tree_leaves(template_state)
    cast = [
        np.asarray(leaf, dtype=np.asarray(tmpl).dtype)
        for leaf, tmpl in zip(leaves, template_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, cast)


def repr_model_metadata(metadata):
    return "\n".join(
        f"  {k: >20} : {v}"
        for k, v in metadata.items()
        if not isinstance(v, np.ndarray)
    )


# ---------------- TorchScript (reference model) import ----------------

_TORCH_LAYER_KEYS = ("conv", "fc")


def torch_state_dict_to_params(sd):
    """Map a reference model state_dict onto (params, bn_state) pytrees."""
    params, bn_state = {}, {}
    names = {k.split(".")[0] for k in sd}
    for name in names:
        if name in ("total_ops", "total_params"):
            continue
        if "bn" in name:
            params[name] = {
                "gamma": np.asarray(sd[f"{name}.weight"]),
                "beta": np.asarray(sd[f"{name}.bias"]),
            }
            bn_state[name] = {
                "mean": np.asarray(sd[f"{name}.running_mean"]),
                "var": np.asarray(sd[f"{name}.running_var"]),
            }
        elif name.startswith("lstm"):
            params[name] = {
                "w_ih": np.asarray(sd[f"{name}.weight_ih_l0"]),
                "w_hh": np.asarray(sd[f"{name}.weight_hh_l0"]),
                "b_ih": np.asarray(sd[f"{name}.bias_ih_l0"]),
                "b_hh": np.asarray(sd[f"{name}.bias_hh_l0"]),
            }
        elif any(k in name for k in _TORCH_LAYER_KEYS):
            params[name] = {
                "w": np.asarray(sd[f"{name}.weight"]),
                "b": np.asarray(sd[f"{name}.bias"]),
            }
        else:
            LOGGER.debug(f"Skipping unrecognized torch layer {name}")
    return params, bn_state


def params_to_torch_state_dict(params, bn_state):
    """Inverse mapping for export back to torch formats."""
    sd = {}
    for name, p in params.items():
        if "bn" in name:
            sd[f"{name}.weight"] = np.asarray(p["gamma"])
            sd[f"{name}.bias"] = np.asarray(p["beta"])
            sd[f"{name}.running_mean"] = np.asarray(bn_state[name]["mean"])
            sd[f"{name}.running_var"] = np.asarray(bn_state[name]["var"])
            sd[f"{name}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
        elif name.startswith("lstm"):
            sd[f"{name}.weight_ih_l0"] = np.asarray(p["w_ih"])
            sd[f"{name}.weight_hh_l0"] = np.asarray(p["w_hh"])
            sd[f"{name}.bias_ih_l0"] = np.asarray(p["b_ih"])
            sd[f"{name}.bias_hh_l0"] = np.asarray(p["b_hh"])
        else:
            sd[f"{name}.weight"] = np.asarray(p["w"])
            sd[f"{name}.bias"] = np.asarray(p["b"])
    return sd


def load_torchscript_model(model_filename, quiet=True):
    """Import a reference TorchScript model + meta.txt extra file."""
    import torch

    extra_files = {"meta.txt": ""}
    ts_model = torch.jit.load(
        model_filename, _extra_files=extra_files, map_location="cpu"
    )
    meta = json.loads(extra_files["meta.txt"])
    sd = {k: v.cpu().numpy() for k, v in ts_model.state_dict().items()}
    params, bn_state = torch_state_dict_to_params(sd)
    # reference meta.txt stores refine arrays cp437-encoded
    if meta.get("refine_kmer_levels") is not None:
        meta["refine_kmer_levels"] = np.frombuffer(
            meta["refine_kmer_levels"].encode("cp437"), dtype=np.float32
        )
    if meta.get("refine_sd_arr") is not None:
        meta["refine_sd_arr"] = np.frombuffer(
            meta["refine_sd_arr"].encode("cp437"), dtype=np.float32
        )
    # reference uses mod_long_names_{i} keys
    if meta.get("mod_bases") not in (None, "None"):
        meta["mod_bases"] = list(meta["mod_bases"])
        meta["mod_long_names"] = [
            str(meta[f"mod_long_names_{i}"])
            for i in range(len(meta["mod_bases"]))
        ]
    else:
        meta["mod_bases"] = []
        meta["mod_long_names"] = []
    if "num_motifs" in meta:
        meta["motifs"] = [
            (meta[f"motif_{i}"], int(meta[f"motif_offset_{i}"]))
            for i in range(int(meta["num_motifs"]))
        ]
    else:
        meta["motifs"] = [(meta["motif"], int(meta["motif_offset"]))]
    meta = add_derived_metadata(meta)
    model = conv_arch_from_params(params)
    if not quiet:
        LOGGER.debug(f"Loaded model metadata:\n{repr_model_metadata(meta)}")
    return model, params, bn_state, meta


def conv_arch_from_params(params):
    """Pick the builtin architecture matching a param set by layer names."""
    if "lstm1" in params:
        return BUILTIN_MODELS["ConvLSTM_w_ref"]
    if "merge_conv4" in params:
        return BUILTIN_MODELS["Conv_w_ref"]
    raise RemoraError("Unknown layer setup in imported model")
