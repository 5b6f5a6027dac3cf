"""Train-state container shared by all training pipelines."""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(rng, model, tx, example_inputs) -> TrainState:
    variables = model.init(rng, *example_inputs, train=False)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def apply_model(model, state: TrainState, *args, train: bool = False,
                **kwargs):
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    if train:
        out, mutated = model.apply(variables, *args, train=True,
                                   mutable=['batch_stats'], **kwargs)
        return out, mutated['batch_stats']
    return model.apply(variables, *args, train=False, **kwargs), \
        state.batch_stats
