"""Optimizers and LR schedules (optax), parity with the reference recipes.

Reference (ref demo/train.py:144-189, src/scheduler.py:5-22):
  * Adam(lr, betas=(0.9, beta2)) by default; SGD(1e-2) for fine-tuning.
  * multi_step_decay: x0.5 at 50/80/90/95% of epochs.
  * delayed_linear_decay (default): constant for epochs/2, then linear to
    1e-2 of the base LR over the remaining epochs.

Schedules are per-EPOCH in the reference (scheduler.step() once per epoch);
we express them per-step with ``steps_per_epoch``.
"""

from __future__ import annotations


import jax
import optax


def multi_step_decay(lr: float, epochs: int, steps_per_epoch: int):
    milestones = [
        epochs * 50 // 100,
        epochs * 80 // 100,
        epochs * 90 // 100,
        epochs * 95 // 100,
    ]
    boundaries = {m * steps_per_epoch: 0.5 for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


def delayed_linear_decay(lr: float, epochs: int, steps_per_epoch: int):
    """Constant for epochs//2 epochs, then LinearLR to 1e-2x.

    torch LinearLR(start=1, end=1e-2, total_iters=T) multiplies by
    1 - 0.99*min(e, T)/T after e scheduler steps; with T = epochs//2 - 1
    the factor reaches 1e-2 one epoch before the end (ref src/scheduler.py:14-21).
    """
    half = epochs // 2
    total_iters = max(epochs // 2 - 1, 1)

    def schedule(step):
        epoch = step // steps_per_epoch
        # number of scheduler.step() calls that have happened entering this epoch
        decay_epochs = epoch - half
        import jax.numpy as jnp

        decay_epochs = jnp.clip(decay_epochs, 0, total_iters)
        factor = 1.0 - 0.99 * decay_epochs / total_iters
        return lr * factor

    return schedule


def get_lr_schedule(kind: str, lr: float, epochs: int, steps_per_epoch: int):
    if kind == "multi_step_decay":
        return multi_step_decay(lr, epochs, steps_per_epoch)
    if kind == "delayed_linear_decay":
        return delayed_linear_decay(lr, epochs, steps_per_epoch)
    if kind in (None, "none", "constant"):
        return lr
    raise ValueError(f"Unknown lr scheduler: {kind}")


def get_optimizer(
    *,
    kind: str = "Adam",
    lr_schedule,
    beta2: float = 0.999,
    trainable_mask=None,
):
    """Adam/SGD with optional parameter-subset masking (fine-tuning).

    ``trainable_mask``: pytree of bools matching params; False leaves get
    zero updates (ref demo/train.py:176-184 trains conv_last only).
    """
    if kind == "Adam":
        tx = optax.adam(lr_schedule, b1=0.9, b2=beta2)
    elif kind == "SGD":
        tx = optax.sgd(lr_schedule)
    else:
        raise ValueError(f"Unknown optimizer: {kind}")
    if trainable_mask is not None:
        # optax.masked applies ``tx`` only to True leaves but passes the
        # False leaves' updates through UNCHANGED (i.e. the raw +gradient
        # would be *added* to frozen params).  Zero the frozen leaves first.
        frozen = jax.tree_util.tree_map(lambda b: not b, trainable_mask)
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), frozen),
            optax.masked(tx, trainable_mask),
        )
    return tx
