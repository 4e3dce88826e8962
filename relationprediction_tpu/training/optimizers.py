"""Update rules: the optax mapping of the reference's algorithm layer.

The reference wraps ``tf.train.{GradientDescent,Adam,Adagrad}Optimizer``
(``tensorflow_backend/algorithms.py:5-55``) and hand-rolls
SGD/AdaGrad/RmsProp/Adam for Theano (``theano_backend/algorithms.py``), with
global-norm gradient clipping applied to the gradient function
(``tensorflow_backend/algorithms.py:58-68``). Here each becomes an optax
chain: clip_by_global_norm -> scale_by_<algorithm> -> -lr.

Defaults follow the TF1 optimizers the reference used: Adam(b1=0.9,
b2=0.999, eps=1e-8), AdaGrad(initial_accumulator=0.1),
RMSProp(decay=0.9, eps=1e-10).
"""
from __future__ import annotations

from typing import Optional

import optax

from ..config import OptimizerConfig


def build_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    name = cfg.algorithm
    kw = dict(cfg.algorithm_kwargs)
    lr = cfg.learning_rate

    if name == "Adam":
        algo = optax.scale_by_adam(
            b1=kw.pop("beta1", 0.9), b2=kw.pop("beta2", 0.999),
            eps=kw.pop("epsilon", 1e-8))
    elif name == "GradientDescent":
        algo = optax.identity()
    elif name == "AdaGrad":
        algo = optax.scale_by_rss(
            initial_accumulator_value=kw.pop("initial_accumulator", 0.1),
            eps=kw.pop("epsilon", 1e-7))
    elif name == "RmsProp":
        algo = optax.scale_by_rms(
            decay=kw.pop("decay", 0.9), eps=kw.pop("epsilon", 1e-10))
    else:
        raise ValueError(f"unknown optimizer algorithm {name!r}")

    steps = []
    if cfg.max_gradient_norm is not None:
        steps.append(optax.clip_by_global_norm(cfg.max_gradient_norm))
    steps.append(algo)
    steps.append(optax.scale(-lr))
    return optax.chain(*steps)
