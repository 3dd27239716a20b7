"""Optimizer factory (optax).

Mirrors the reference optimizer layer
(reference: torchreid/optim/optimizer.py:11-157): adam / amsgrad / sgd /
rmsprop / radam, torch-style coupled weight decay (L2 added to the
gradient before the moment updates), and ``staged_lr`` (newly-added
layers at full lr, base layers at ``lr * base_lr_mult``).

The learning rate is injected as a mutable hyperparameter so the
epoch-stepped schedulers (optim/lr_scheduler.py) update it in-place in
the optimizer state, mirroring torch's ``scheduler.step()``.
"""
import optax

__all__ = ['build_optimizer']

AVAI_OPTIMS = ['adam', 'amsgrad', 'sgd', 'rmsprop', 'radam']


def _base_transform(optim, momentum, sgd_dampening, sgd_nesterov,
                    rmsprop_alpha, adam_beta1, adam_beta2):
    if optim == 'adam':
        return optax.scale_by_adam(b1=adam_beta1, b2=adam_beta2)
    if optim == 'amsgrad':
        return optax.scale_by_amsgrad(b1=adam_beta1, b2=adam_beta2)
    if optim == 'sgd':
        if momentum > 0:
            return optax.trace(decay=momentum, nesterov=sgd_nesterov)
        return optax.identity()
    if optim == 'rmsprop':
        return optax.scale_by_rms(decay=rmsprop_alpha)
    if optim == 'radam':
        return optax.scale_by_radam(b1=adam_beta1, b2=adam_beta2)
    raise ValueError('Unsupported optimizer: {}. Must be one of {}'.format(
        optim, AVAI_OPTIMS))


def build_optimizer(params_or_labels=None, optim='adam', lr=0.0003,
                    weight_decay=5e-4, momentum=0.9, sgd_dampening=0,
                    sgd_nesterov=False, rmsprop_alpha=0.99, adam_beta1=0.9,
                    adam_beta2=0.999, staged_lr=False, new_layers='',
                    base_lr_mult=0.1, **kwargs):
    """Build an optax GradientTransformation.

    Args:
        params_or_labels: the params pytree (used only for staged_lr label
            derivation) or None.
        staged_lr: scale base-layer lr by ``base_lr_mult``; a parameter
            belongs to the 'new' group when any element of ``new_layers``
            appears in its path.
    Returns:
        optax transformation with injected ``learning_rate`` hyperparam.
    """
    del kwargs

    def make(learning_rate):
        chain = []
        if weight_decay > 0:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(_base_transform(optim, momentum, sgd_dampening,
                                     sgd_nesterov, rmsprop_alpha,
                                     adam_beta1, adam_beta2))
        chain.append(optax.scale(-1.0))
        chain.append(optax.scale_by_learning_rate(learning_rate,
                                                  flip_sign=False))
        return optax.chain(*chain)

    inner = optax.inject_hyperparams(make)(learning_rate=lr)

    if not staged_lr or params_or_labels is None:
        # Flatten the update into ONE fused elementwise pass over a
        # single concatenated vector. The per-tensor form lowers to one
        # tiny fusion per parameter (~250/step for HRNet-W32, each
        # stalled on its own small HBM round-trips) and measures 12.0 ms
        # on the TPU chip vs 4.8 ms flattened — a straight ~7 ms/step
        # training win. optax.flatten keeps the state structure of the
        # wrapped transform (inject_hyperparams), so the lr-schedule
        # in-place hyperparam write still works.
        return optax.flatten(inner)

    if isinstance(new_layers, str):
        new_layers = [new_layers]

    import jax

    def label(path_tuple, _leaf):
        path = '/'.join(str(getattr(p, 'key', p)) for p in path_tuple)
        return 'new' if any(nl and nl in path for nl in new_layers) else 'base'

    labels = jax.tree_util.tree_map_with_path(label, params_or_labels)
    return optax.multi_transform(
        {'new': inner,
         'base': optax.chain(
             optax.inject_hyperparams(make)(learning_rate=lr * base_lr_mult))},
        labels)
