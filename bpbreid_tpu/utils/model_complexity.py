"""Model complexity: parameter count + FLOPs.

The reference counts params/FLOPs with torch forward hooks
(reference: torchreid/utils/model_complexity.py:264-330, with a
BPBreID-aware branch feeding dummy masks :326-328). Here XLA does the
counting: params from the pytree, FLOPs from the compiled computation's
cost analysis — exact for whatever fusion XLA actually emits.
"""
import numpy as np

__all__ = ['compute_model_complexity']


def count_params(params):
    import jax
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def compute_model_complexity(model, cfg=None, height=None, width=None,
                             verbose=False):
    """Returns (num_params, flops) for one forward pass at batch size 1."""
    import jax
    import jax.numpy as jnp

    h = height or (cfg.data.height if cfg is not None else 256)
    w = width or (cfg.data.width if cfg is not None else 128)
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    num_params = count_params(variables['params'])

    def fwd(v, x):
        return model.apply(v, x, train=False)

    flops = 0
    try:
        lowered = jax.jit(fwd).lower(variables, dummy)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        flops = int(cost.get('flops', 0))
    except Exception:
        pass
    if verbose:
        print('Model complexity: params={:,} flops={:,}'.format(
            num_params, flops))
    return num_params, flops
