"""Learning-rate schedules (reference parity, usable as optax schedules).

  * ``poly_warmup_decay_lr`` — the SFF trainers' schedule
    (calculate_lr, sff_scripts_interp/main_ms.py:127-135): polynomial warmup
    from end_lr to base_lr over ``warmup_iters``, then polynomial decay back
    to end_lr over ``decay_iters``, then constant end_lr. When
    base_lr == end_lr the trainers skip the schedule entirely
    (main_ms.py:179-181) — the formula reduces to the same constant.
  * ``step_lr`` — the SP trainers' torch StepLR(step_size=30, gamma=0.5)
    (sp_scripts_train/main_interp.py).
"""

import jax.numpy as jnp


def poly_warmup_decay_lr(base_lr, end_lr, warmup_iters, decay_iters,
                         power=1.5):
    """Returns an optax-style schedule fn: step -> lr (jnp scalar)."""
    base_lr = float(base_lr)
    end_lr = float(end_lr)

    def schedule(step):
        it = jnp.asarray(step, jnp.float32)
        if warmup_iters > 0:
            warm = (base_lr - end_lr) * jnp.power(
                it / warmup_iters, power
            ) + end_lr
        else:
            warm = jnp.float32(base_lr)
        decay = (base_lr - end_lr) * jnp.power(
            jnp.maximum(1.0 - (it - warmup_iters) / decay_iters, 0.0), power
        ) + end_lr
        lr = jnp.where(it < warmup_iters, warm,
                       jnp.where(it < decay_iters, decay, end_lr))
        return lr

    return schedule


def step_lr(base_lr, step_size=30, gamma=0.5, steps_per_epoch=1):
    """torch StepLR parity: lr = base * gamma^(epoch // step_size)."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // steps_per_epoch
        return base_lr * jnp.power(gamma, jnp.floor(epoch / step_size))

    return schedule
