"""Epoch-stepped learning-rate schedules.

Mirrors the reference scheduler layer
(reference: torchreid/optim/lr_scheduler.py:8-131): single_step,
multi_step, warmup_multi_step (linear warmup over 10 epochs from factor
1/100, then x0.1 decays — the reid-strong-baseline recipe) and cosine.

Returned object maps ``epoch -> lr``; the engine writes it into the
optimizer's injected ``learning_rate`` hyperparameter each epoch.
"""
import math

__all__ = ['build_lr_scheduler', 'LRSchedule']

AVAI_SCH = ['single_step', 'multi_step', 'warmup_multi_step', 'cosine']


class LRSchedule:
    def __init__(self, fn, base_lr):
        self.fn = fn
        self.base_lr = base_lr

    def __call__(self, epoch):
        return self.fn(epoch)

    def set_in_opt_state(self, opt_state, epoch):
        """Write lr(epoch) into an inject_hyperparams optimizer state."""
        import jax.numpy as jnp
        lr = self(epoch)

        def visit(state):
            if hasattr(state, 'hyperparams') and 'learning_rate' in state.hyperparams:
                state.hyperparams['learning_rate'] = jnp.asarray(
                    lr, state.hyperparams['learning_rate'].dtype)
            if hasattr(state, 'inner_states'):
                for s in state.inner_states.values():
                    visit(s.inner_state if hasattr(s, 'inner_state') else s)

        visit(opt_state)
        return opt_state


def build_lr_scheduler(lr=0.0003, lr_scheduler='single_step', stepsize=1,
                       gamma=0.1, max_epoch=1, warmup_iters=10,
                       warmup_factor=0.01, **kwargs):
    del kwargs
    if isinstance(stepsize, int):
        stepsize = [stepsize]

    if lr_scheduler == 'single_step':
        step = stepsize[-1] if isinstance(stepsize, (list, tuple)) else stepsize

        def fn(epoch):
            return lr * (gamma ** (epoch // step))
    elif lr_scheduler == 'multi_step':
        def fn(epoch):
            return lr * (gamma ** sum(epoch >= s for s in stepsize))
    elif lr_scheduler == 'warmup_multi_step':
        def fn(epoch):
            if epoch < warmup_iters:
                alpha = epoch / warmup_iters
                warm = warmup_factor * (1 - alpha) + alpha
            else:
                warm = 1.0
            return lr * warm * (gamma ** sum(epoch >= s for s in stepsize))
    elif lr_scheduler == 'cosine':
        def fn(epoch):
            return 0.5 * lr * (1 + math.cos(math.pi * epoch / max_epoch))
    else:
        raise ValueError('Unsupported scheduler: {}. Must be one of {}'
                         .format(lr_scheduler, AVAI_SCH))
    return LRSchedule(fn, lr)
