"""Train state + jitted/pjit train-step factories.

TPU-first design: one compiled step function per trainer; data parallelism is
expressed by sharding the batch over the mesh 'data' axis and replicating the
state — the SPMD partitioner inserts the gradient all-reduce over ICI (no
DataParallel-style replicate/scatter/gather, cf. SURVEY §2.7 P1).

Optimizer parity: the reference uses torch Adam plus a *manual* decoupled
weight decay ``p -= wd * lr * p`` applied around the step
(main_ms.py:207-210) — exactly optax.adamw's decoupled decay.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, params, opt, batch_stats=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt.init(params),
        )


def make_optimizer(schedule, weight_decay=None, b1=0.9, b2=0.999, eps=1e-8):
    """Adam (+ decoupled weight decay) with a per-step LR schedule."""
    if weight_decay:
        return optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                           weight_decay=float(weight_decay))
    return optax.adam(schedule, b1=b1, b2=b2, eps=eps)


def make_train_step(loss_fn: Callable, opt, has_batch_stats: bool = False,
                    mesh=None, donate: bool = True, remat: bool = False):
    """Build a compiled train step.

    loss_fn(params, batch_stats, batch) ->
        (loss, aux_dict)                        if not has_batch_stats
        (loss, (aux_dict, new_batch_stats))     if has_batch_stats

    Returns step(state, batch) -> (state, metrics). If ``mesh`` is given, the
    batch is sharded over its 'data' axis and the state is replicated.
    remat=True rematerializes the forward during backward (jax.checkpoint):
    trades FLOPs for activation memory, enabling larger batches/crops.
    """
    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    def step_fn(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, aux), grads = grad_fn(state.params, state.batch_stats, batch)
        if has_batch_stats:
            metrics, new_bs = aux
        else:
            metrics, new_bs = aux, state.batch_stats
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return (
            state.replace(step=state.step + 1, params=params,
                          batch_stats=new_bs, opt_state=new_opt),
            metrics,
        )

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(replicated, data_sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(apply_fn: Callable, mesh=None):
    """Compiled inference step: (variables, batch) -> prediction."""

    def eval_fn(variables, batch):
        return apply_fn(variables, batch)

    if mesh is None:
        return jax.jit(eval_fn)
    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(eval_fn, in_shardings=(replicated, data_sharded),
                   out_shardings=data_sharded)
