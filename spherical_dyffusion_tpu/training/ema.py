"""Exponential moving average of parameters as a pytree transform.

Equivalent of the reference LitEma (src/models/modules/ema.py:7-60): decay
warmup ``min(decay, (1 + n) / (10 + n))`` over the first updates; swapping to
EMA weights for evaluation is just using the ``ema_params`` pytree (the
reference's ema_scope context manager, _base_experiment.py:386-401, becomes a
parameter choice at apply time).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["EmaState", "ema_init", "ema_update"]


class EmaState(NamedTuple):
    params: Any  # EMA pytree
    count: jnp.ndarray  # number of updates


def ema_init(params: Any) -> EmaState:
    # jnp.copy (not asarray): the EMA tree must not ALIAS the live params —
    # aliased buffers break jit donation ("attempt to donate the same buffer
    # twice") when the whole TrainState is donated
    return EmaState(params=jax.tree_util.tree_map(jnp.copy, params),
                    count=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, new_params: Any, decay: float = 0.9999,
               use_num_updates: bool = True) -> EmaState:
    count = state.count + 1
    if use_num_updates:
        d = jnp.minimum(decay, (1.0 + count) / (10.0 + count))
    else:
        d = jnp.asarray(decay)
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype), state.params, new_params
    )
    return EmaState(params=new_ema, count=count)
