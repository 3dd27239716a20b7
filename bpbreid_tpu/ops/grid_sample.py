"""Affine grid sampling (spatial transformer) matching torch semantics.

Equivalent of ``F.affine_grid`` + ``F.grid_sample`` with the torch
defaults (bilinear, zeros padding, align_corners=False), used by the
HACNN hard-attention branch (reference: torchreid/models/hacnn.py:287-295).
Expressed as batched gathers — jit/vmap friendly, static shapes.
"""
import jax
import jax.numpy as jnp

__all__ = ['affine_grid_sample']


def affine_grid_sample(x, theta, out_h=None, out_w=None):
    """Sample ``x`` [N, H, W, C] at an affine grid defined by ``theta``
    [N, 2, 3]; returns [N, out_h, out_w, C]."""
    n, h, w, c = x.shape
    out_h = out_h or h
    out_w = out_w or w
    # normalized target coords, align_corners=False convention
    ys = (2.0 * jnp.arange(out_h) + 1.0) / out_h - 1.0
    xs = (2.0 * jnp.arange(out_w) + 1.0) / out_w - 1.0
    gx, gy = jnp.meshgrid(xs, ys)                      # [out_h, out_w]
    ones = jnp.ones_like(gx)
    tgt = jnp.stack([gx, gy, ones], axis=-1)           # [out_h, out_w, 3]
    # source normalized coords: [N, out_h, out_w, 2]
    src = jnp.einsum('nij,hwj->nhwi', theta, tgt)
    sx, sy = src[..., 0], src[..., 1]
    # to pixel coords (align_corners=False)
    u = ((sx + 1.0) * w - 1.0) / 2.0
    v = ((sy + 1.0) * h - 1.0) / 2.0

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    def gather(vi, ui):
        valid = ((vi >= 0) & (vi < h) & (ui >= 0) & (ui < w))
        vi_c = jnp.clip(vi, 0, h - 1).astype(jnp.int32)
        ui_c = jnp.clip(ui, 0, w - 1).astype(jnp.int32)
        batch = jnp.arange(n)[:, None, None]
        vals = x[batch, vi_c, ui_c]                    # [N, oh, ow, C]
        return vals * valid[..., None]

    p00 = gather(v0, u0)
    p01 = gather(v0, u0 + 1)
    p10 = gather(v0 + 1, u0)
    p11 = gather(v0 + 1, u0 + 1)
    du = du[..., None]
    dv = dv[..., None]
    return ((1 - dv) * ((1 - du) * p00 + du * p01)
            + dv * ((1 - du) * p10 + du * p11))
