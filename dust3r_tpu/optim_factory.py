"""Optimizer helpers (reference dust3r/optim_factory.py).

The LR is injected per-iteration into the optax state; on torch the
reference mutates param_group['lr'] - here the equivalent knob is the
hyperparams dict of an optax.inject_hyperparams optimizer."""


def adjust_learning_rate_by_lr(opt_state, lr):
    """Set the learning rate on an inject_hyperparams optimizer state."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state
