"""Minimal API demo (reference analog ``scripts/api_example.py``)."""

import jax

from remora_tpu.data.read import RemoraRead
from remora_tpu.infer.duplex_infer import call_read_mods
from remora_tpu.infer.infer import make_model_eval_fn
from remora_tpu.models import model_io

model, params, bn_state, meta = model_io.load_model(
    "train_results/model_best.checkpoint"
)
eval_fn = make_model_eval_fn(model, params, bn_state)
read = RemoraRead.test_read(100)
print(call_read_mods(read, eval_fn, meta, focus_offset=50))
