"""Average parameters over several checkpoints of one architecture.

Reference analog ``scripts/average_models.py``. Works on remora_tpu
native .npz checkpoints; metadata is taken from the first input.
"""

import argparse

import numpy as np

from remora_tpu.models import model_io


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoints", nargs="+", help="input checkpoints")
    parser.add_argument("--out-path", required=True)
    args = parser.parse_args()

    flats = []
    bn_flats = []
    meta = meta_arrays = None
    for path in args.checkpoints:
        data = np.load(path, allow_pickle=False)
        flats.append(
            {
                k: data[k]
                for k in data.files
                if k.startswith("params/")
            }
        )
        bn_flats.append(
            {k: data[k] for k in data.files if k.startswith("bn/")}
        )
        if meta is None:
            import json

            meta = json.loads(bytes(data["__meta__"]).decode())
            meta_arrays = {
                k[len("meta_arr/") :]: data[k]
                for k in data.files
                if k.startswith("meta_arr/")
            }
    avg_params = {
        k[len("params/") :]: np.mean([f[k] for f in flats], axis=0)
        for k in flats[0]
    }
    avg_bn = {
        k[len("bn/") :]: np.mean([f[k] for f in bn_flats], axis=0)
        for k in bn_flats[0]
    }
    model_io.save_model(
        args.out_path,
        model_io.unflatten_tree(avg_params),
        model_io.unflatten_tree(avg_bn),
        meta,
        meta_arrays,
    )
    print(f"Averaged {len(flats)} checkpoints -> {args.out_path}")


if __name__ == "__main__":
    main()
