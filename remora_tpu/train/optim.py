"""Optimizer, LR schedule, and adaptive gradient clipping.

Reference analogs: ``TrainOpts``/``CustomPlusCoolDownScheduler``
(``model_util.py:34–107``) and ``RollingMAD``/``apply_clipping``
(``train_model.py:60–131``). Built on optax with per-epoch LR injection
to mirror torch's per-epoch scheduler stepping.
"""

import math
from dataclasses import dataclass, field

import numpy as np
import optax

from remora_tpu import constants, log

LOGGER = log.get_logger()


def med_mad(data, factor=constants.PA_TO_NORM_SCALING_FACTOR, axis=None):
    dmed = np.median(data, axis=axis, keepdims=True)
    dmad = factor * np.median(abs(data - dmed), axis=axis, keepdims=True)
    if axis is None:
        return dmed.flatten()[0], dmad.flatten()[0]
    return dmed.squeeze(axis), dmad.squeeze(axis)


class RollingMAD:
    """Rolling median + n*MAD threshold over a window per tracked value."""

    def __init__(self, nparams, n_mads=0, window=1000, default_to=None):
        self.n_mads = n_mads
        self.default_to = default_to
        self._window_data = np.empty((nparams, window), dtype="f4")
        self._curr_iter = 0

    @property
    def nparams(self):
        return self._window_data.shape[0]

    @property
    def window(self):
        return self._window_data.shape[1]

    def update(self, vals):
        assert len(vals) == self.nparams
        self._window_data[:, self._curr_iter % self.window] = vals
        self._curr_iter += 1
        if self._curr_iter < self.window:
            return self.default_to
        med, mad = med_mad(self._window_data, axis=1)
        return med + (mad * self.n_mads)


def cosine_with_cooldown(initial_lr, epochs, cool_down_epochs, cool_down_lr,
                         eta_min=1e-6, t_max=None):
    """lr(epoch) mirroring torch CosineAnnealingLR stepped per epoch plus
    a flat cool-down tail."""
    if t_max is None:
        t_max = epochs

    def lr_at(epoch):
        if epoch >= epochs - 1:
            return cool_down_lr
        return eta_min + (initial_lr - eta_min) * (
            1 + math.cos(math.pi * epoch / t_max)
        ) / 2

    return lr_at


@dataclass
class TrainOpts:
    epochs: int = constants.DEFAULT_EPOCHS
    early_stopping: int = constants.DEFAULT_EARLY_STOPPING
    optimizer_str: str = constants.DEFAULT_OPTIMIZER
    opt_kwargs: tuple = constants.DEFAULT_OPT_VALUES
    learning_rate: float = constants.DEFAULT_LR
    lr_scheduler_str: str = constants.DEFAULT_SCHEDULER
    lr_scheduler_kwargs: tuple = constants.DEFAULT_SCH_VALUES
    lr_cool_down_epochs: int = constants.DEFAULT_SCH_COOL_DOWN_EPOCHS
    lr_cool_down_lr: float = constants.DEFAULT_SCH_COOL_DOWN_LR

    def _parsed_kwargs(self, kwargs):
        return {
            key: constants.TYPE_CONVERTERS[typ](val)
            for key, val, typ in kwargs
        }

    def load_optimizer(self):
        """Build an optax transform with an injectable learning rate."""
        kw = self._parsed_kwargs(self.opt_kwargs)
        name = self.optimizer_str.lower()
        if name == "adamw":
            tx = optax.inject_hyperparams(optax.adamw)(
                learning_rate=self.learning_rate,
                weight_decay=kw.get("weight_decay", 1e-4),
                b1=kw.get("beta1", 0.9),
                b2=kw.get("beta2", 0.999),
                eps=kw.get("eps", 1e-8),
            )
        elif name == "adam":
            tx = optax.inject_hyperparams(optax.adam)(
                learning_rate=self.learning_rate
            )
        elif name == "sgd":
            tx = optax.inject_hyperparams(optax.sgd)(
                learning_rate=self.learning_rate,
                momentum=kw.get("momentum", 0.0),
            )
        else:
            raise ValueError(f"Unknown optimizer {self.optimizer_str}")
        return tx

    def load_scheduler(self):
        skw = self._parsed_kwargs(self.lr_scheduler_kwargs)
        name = self.lr_scheduler_str.lower()
        if name in ("cosine", "cosineannealinglr"):
            return cosine_with_cooldown(
                self.learning_rate,
                self.epochs,
                self.lr_cool_down_epochs,
                self.lr_cool_down_lr,
                eta_min=skw.get("eta_min", 1e-6),
                t_max=skw.get("T_max"),
            )
        if name in ("constant", "none"):
            return lambda epoch: self.learning_rate
        raise ValueError(f"Unknown scheduler {self.lr_scheduler_str}")
