"""Export a checkpoint as legacy Guppy-style JSON (fused conv+BN,
base64 weights).

Reference analog ``scripts/convert_ts_to_ont_json.py``.
"""

import argparse
import base64
import json

import numpy as np

from remora_tpu.models import model_io
from remora_tpu.models.export import _CONV_TO_BN, fuse_conv_bn


def tensor_entry(arr):
    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.float32))
    return {
        "shape": list(arr.shape),
        "data": base64.b64encode(arr.tobytes()).decode("ascii"),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("out_json")
    args = parser.parse_args()

    model, params, bn_state, meta = model_io.load_model(args.checkpoint)
    layers = {}
    for name, p in params.items():
        if "bn" in name:
            continue
        if name in _CONV_TO_BN:
            bn_names = _CONV_TO_BN[name]
            if isinstance(bn_names, tuple):
                bn_name = next(b for b in bn_names if b in params)
            else:
                bn_name = bn_names
            fused = fuse_conv_bn(p, params[bn_name], bn_state[bn_name])
            layers[name] = {
                "weight": tensor_entry(fused["w"]),
                "bias": tensor_entry(fused["b"]),
            }
        elif name.startswith("lstm"):
            layers[name] = {
                k: tensor_entry(p[k]) for k in ("w_ih", "w_hh", "b_ih", "b_hh")
            }
        else:
            layers[name] = {
                "weight": tensor_entry(p["w"]),
                "bias": tensor_entry(p["b"]),
            }
    doc = {
        "model_metadata": {
            k: v
            for k, v in meta.items()
            if isinstance(v, (str, int, float, bool, list, tuple))
            or v is None
        },
        "layers": layers,
    }
    with open(args.out_json, "w") as fh:
        json.dump(doc, fh)
    print(f"Wrote {args.out_json}")


if __name__ == "__main__":
    main()
