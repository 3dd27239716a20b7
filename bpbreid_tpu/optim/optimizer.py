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

__all__ = ['build_optimizer', 'flatten_bucketed']

AVAI_OPTIMS = ['adam', 'amsgrad', 'sgd', 'rmsprop', 'radam']


def flatten_bucketed(inner, n_buckets=16):
    """``optax.flatten``, but over size-balanced buckets of leaves.

    The wrapped transform sees a dict of ``n_buckets`` flat vectors, so
    the update is a handful of large fused elementwise passes (instead
    of ~250 tiny per-tensor fusions, or one 35M-element ravel whose
    ~250-way concatenate XLA lowers as a multi-level tree that
    re-materializes the whole gradient vector several times per step).
    Buckets are contiguous runs of the flattened-leaf order, balanced by
    element count, so the partition is deterministic for a given tree.
    """
    import jax
    import jax.numpy as jnp

    def _partition(leaves):
        sizes = [int(l.size) for l in leaves]
        total = float(sum(sizes))
        k = max(1, min(n_buckets, len(leaves)))
        assign, acc, b = [], 0.0, 0
        for s in sizes:
            if b < k - 1 and acc >= total * (b + 1) / k:
                b += 1
            assign.append(b)
            acc += s
        # a single huge leaf can jump ``acc`` past several targets,
        # leaving later bucket ids unused — renumber to consecutive ids
        used = sorted(set(assign))
        remap = {old: new for new, old in enumerate(used)}
        return [remap[a] for a in assign], len(used)

    def _bucketize(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        assign, k = _partition(leaves)
        buckets = {}
        for b in range(k):
            group = [l.ravel() for l, a in zip(leaves, assign) if a == b]
            buckets[str(b)] = (group[0] if len(group) == 1
                               else jnp.concatenate(group))
        return buckets, (leaves, treedef, assign, k)

    def _unbucketize(buckets, spec):
        leaves, treedef, assign, k = spec
        out = []
        offsets = {b: 0 for b in range(k)}
        for leaf, b in zip(leaves, assign):
            vec = buckets[str(b)]
            off = offsets[b]
            out.append(jax.lax.dynamic_slice_in_dim(
                vec, off, leaf.size).reshape(leaf.shape))
            offsets[b] = off + int(leaf.size)
        return jax.tree_util.tree_unflatten(treedef, out)

    def init_fn(params):
        buckets, _ = _bucketize(params)
        return inner.init(buckets)

    def update_fn(updates, state, params=None):
        buckets, spec = _bucketize(updates)
        pbuckets = _bucketize(params)[0] if params is not None else None
        new_buckets, new_state = inner.update(buckets, state, pbuckets)
        return _unbucketize(new_buckets, spec), new_state

    return optax.GradientTransformation(init_fn, update_fn)


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
        # Flatten the update into a handful of fused elementwise passes
        # over size-balanced concatenated buckets. The per-tensor form
        # lowers to one tiny fusion per parameter (~250/step for
        # HRNet-W32, each stalled on its own small HBM round-trips,
        # 12.0 ms on the chip); optax.flatten's single 35M-element ravel
        # is better (4.8 ms) but XLA lowers the ~250-way concat as a
        # multi-level concat tree that re-materializes the full gradient
        # vector 2-3x per step (round-4 profile: ~3.7 ms of concatenate
        # rows). Bucketing keeps every concat single-level while still
        # amortizing fusion overhead. State structure of the wrapped
        # transform (inject_hyperparams) is preserved, so the
        # lr-schedule in-place hyperparam write still works.
        return flatten_bucketed(inner)

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
