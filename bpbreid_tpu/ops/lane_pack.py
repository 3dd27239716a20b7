"""Space-to-depth lane packing for narrow-channel conv stacks.

The TPU vector unit has 128 lanes on the channel (minor) dimension; a
32-channel NHWC activation occupies 1/4 of them, so every elementwise
op, BN reduction and conv on the HRNet 32-ch full-resolution branch
moves up to 4x the logical HBM bytes. Packing 2x2 spatial blocks into
channels ([N,H,W,32] -> [N,H/2,W/2,128]) makes the layout lane-dense;
a stride-1 3x3 conv commutes with the packing when its kernel is folded
into an equivalent (block-sparse, materialized dense) 3x3 conv over the
packed channels.

Real-chip measurements (experiments/lane_packing_bench.py, v5e,
2026-08-19): the packed conv+BN train-mode chain at the HRNet branch-0
shape ([64,96,32,32], 8 convs deep) runs 1.16-1.25x faster fwd+bwd even
though the folded dense kernel does 4x the MACs (the chain is
memory-bound). The same packing is a LOSS for 64-channel shapes
(0.75-0.94x) and for the int8/bf16 inference graph (0.77-1.0x), so it
is applied ONLY to the 32-channel branch in train mode
(see models/hrnet.py).

Reference semantics preserved: torchreid/models/hrnet.py:314-602
(BasicBlock branches; BN momentum/eps unchanged — the folded BN in
models/common.py computes bit-equal statistics by summing the four
spatial phases of each logical channel).
"""
import jax.numpy as jnp

BLOCK = 2
FOLD = BLOCK * BLOCK


def space_to_depth(x):
    """[N, H, W, C] -> [N, H/2, W/2, 4C]; packed channel index is
    ``(dy*2+dx)*C + c`` for spatial phase (dy, dx)."""
    n, h, w, c = x.shape
    assert h % BLOCK == 0 and w % BLOCK == 0, (h, w)
    x = x.reshape(n, h // BLOCK, BLOCK, w // BLOCK, BLOCK, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // BLOCK, w // BLOCK, FOLD * c)


def depth_to_space(x):
    """Inverse of :func:`space_to_depth`."""
    n, h, w, c4 = x.shape
    c = c4 // FOLD
    x = x.reshape(n, h, w, BLOCK, BLOCK, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * BLOCK, w * BLOCK, c)


def pack_conv3x3_kernel(w):
    """Fold a stride-1 pad-1 3x3 HWIO kernel [3,3,Cin,Cout] into the
    equivalent 3x3 kernel [3,3,4Cin,4Cout] over space-to-depth-packed
    activations: ``d2s(conv(s2d(x), pack(w))) == conv(x, w)``.

    Derivation: output phase (dy,dx) at packed position (p,q) is
    y[2p+dy, 2q+dx] = sum_{u,v} W[u,v] x[2p+dy+u-1, 2q+dx+v-1]; writing
    the input index as 2(p+a)+ey gives a = floor((dy+u-1)/2) in
    {-1,0,1} and ey = (dy+u-1) mod 2 — a 3x3 conv in packed space whose
    (a+1, b+1) tap connects input phase (ey,ex) to output phase (dy,dx)
    with the original [Cin,Cout] block. 3/4 of the folded kernel is
    structurally zero (4x MACs); see module docstring for why that
    still wins at 32 channels.
    """
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    wp = jnp.zeros((3, 3, FOLD * cin, FOLD * cout), w.dtype)
    for dy in range(BLOCK):
        for u in range(3):
            a, ey = divmod(dy + u - 1 + 2, 2)
            a -= 1
            for dx in range(BLOCK):
                for v in range(3):
                    b, ex = divmod(dx + v - 1 + 2, 2)
                    b -= 1
                    ci = (ey * BLOCK + ex) * cin
                    co = (dy * BLOCK + dx) * cout
                    wp = wp.at[a + 1, b + 1, ci:ci + cin,
                               co:co + cout].set(w[u, v])
    return wp
