"""Is the packed-vs-unpacked HRNet gradient difference reassociation
chaos or a bug? Baseline: the SAME unpacked model on a batch-permuted
input (sum-of-squares loss is permutation invariant, so parameter
gradients are mathematically identical; only reduction order changes).
If unpacked-vs-permuted shows the same rel-norm diff scale as
packed-vs-unpacked on the same leaves, the difference is f32 chaos
(ReLU boundary flips + BN rsqrt amplification), not an indexing error.
"""
import os

import jax
jax.config.update('jax_platforms', os.environ.get('JAX_PLATFORMS', 'cpu'))
import jax.numpy as jnp
import numpy as np

from bpbreid_tpu.models.hrnet import HighResolutionNet


def main():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 3)), jnp.float32)
    # batch "permutation" with 2 images: swap them
    xp = x[::-1]
    net_off = HighResolutionNet(lane_pack_train=False)
    net_on = HighResolutionNet(lane_pack_train=True)
    variables = net_off.init(jax.random.PRNGKey(0), x, train=False)

    def fwd(net):
        def f(params, x):
            y, _ = net.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                x, train=True, mutable=['batch_stats'])
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return f

    g0 = jax.grad(fwd(net_off))(variables['params'], x)
    g0p = jax.grad(fwd(net_off))(variables['params'], xp)
    g1 = jax.grad(fwd(net_on))(variables['params'], x)

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)

    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat0p = dict(jax.tree_util.tree_leaves_with_path(g0p))
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    rows = []
    for path, v in flat0:
        rows.append((rel(flat0p[path], v), rel(flat1[path], v),
                     jax.tree_util.keystr(path)))
    rows.sort(reverse=True)
    print(f"{'chaos(perm)':>12} {'packed':>12}  leaf  (top 25 by chaos)")
    for c, p, name in rows[:25]:
        print(f"{c:12.3e} {p:12.3e}  {name}")
    rows.sort(key=lambda r: -r[1])
    print(f"{'chaos(perm)':>12} {'packed':>12}  leaf  (top 25 by packed)")
    for c, p, name in rows[:25]:
        print(f"{c:12.3e} {p:12.3e}  {name}")
    chaos = np.array([r[0] for r in rows])
    packed = np.array([r[1] for r in rows])
    print(f"median chaos {np.median(chaos):.3e} packed {np.median(packed):.3e}")
    print(f"max    chaos {chaos.max():.3e} packed {packed.max():.3e}")


if __name__ == '__main__':
    main()
