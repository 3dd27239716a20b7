"""Generic torch-checkpoint -> flax-variables converter.

Because every module in this framework names its parameters after the
reference torch ``state_dict`` path (models/common.py docstring), the
conversion is purely mechanical:

  params/<p1>/<p2>/.../kernel  <-  '<p1>.<p2>....weight'  (transposed)
  params/.../scale             <-  '....weight'           (batchnorm)
  batch_stats/.../mean|var     <-  '....running_mean|running_var'

Supports partial, shape-checked loading with the reference semantics
(reference: torchreid/utils/torchtools.py:260-321 — layers that do not
match in name or size are left at their initialized values).
"""
import numpy as np

__all__ = ['torch_to_flax', 'load_torch_state_dict', 'flax_to_torch']


def _is_leaf_dict(d):
    return not isinstance(d, dict)


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _torch_key_and_transform(path, collection):
    """Map a flax variable path to its torch state_dict key + transform."""
    *mods, leaf = path
    base = '.'.join(mods)
    if collection == 'batch_stats':
        if leaf == 'mean':
            return base + '.running_mean', lambda a: a
        if leaf == 'var':
            return base + '.running_var', lambda a: a
        raise KeyError(leaf)
    if leaf == 'kernel':
        def t(a):
            if a.ndim == 4:            # OIHW -> HWIO
                return np.transpose(a, (2, 3, 1, 0))
            if a.ndim == 2:            # OI -> IO
                return np.transpose(a, (1, 0))
            return a
        return base + '.weight', t
    if leaf == 'scale':                # batchnorm affine weight
        return base + '.weight', lambda a: a
    if leaf == 'bias':
        return base + '.bias', lambda a: a
    if leaf == 'embedding':
        return base + '.weight', lambda a: a
    # raw nn.Parameter with its own name (e.g. mudeep fusion gates):
    # torch stores NCHW-broadcast shapes; flax uses NHWC
    def t_raw(a):
        if a.ndim == 4:
            return np.transpose(a, (0, 2, 3, 1))
        return a
    return '.'.join(path), t_raw


def torch_to_flax(state_dict, variables, strict=False):
    """Fill a flax variables pytree from a torch state_dict.

    Args:
        state_dict: dict of torch-style names -> numpy arrays (or torch
            tensors; ``.numpy()`` is attempted).
        variables: flax variables dict {'params': ..., 'batch_stats': ...}
            (typically from ``model.init``) supplying structure + shapes.
        strict: raise on missing/mismatched keys instead of skipping.

    Returns:
        (new_variables, matched_keys, discarded) where ``discarded`` holds
        flax paths left at their initialized values.
    """
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, 'detach'):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    matched, discarded = [], []

    def convert(tree, collection, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = convert(v, collection, prefix + (k,))
            else:
                path = prefix + (k,)
                try:
                    tkey, tfm = _torch_key_and_transform(path, collection)
                except KeyError:
                    out[k] = v
                    discarded.append('/'.join(path))
                    continue
                if tkey in sd:
                    arr = tfm(sd[tkey])
                    if arr.shape == tuple(v.shape):
                        out[k] = arr.astype(np.asarray(v).dtype)
                        matched.append(tkey)
                        continue
                    if strict:
                        raise ValueError('shape mismatch for {}: torch {} vs '
                                         'flax {}'.format(tkey, arr.shape, v.shape))
                elif strict:
                    raise KeyError('missing torch key {}'.format(tkey))
                out[k] = v
                discarded.append('/'.join(path))
        return out

    new_vars = {}
    for coll, tree in variables.items():
        if coll in ('params', 'batch_stats'):
            new_vars[coll] = convert(tree, coll)
        else:
            new_vars[coll] = tree
    return new_vars, matched, discarded


def flax_to_torch(variables):
    """Inverse mapping: flax variables -> torch-style state_dict of numpy
    arrays (for interop / exporting checkpoints)."""
    out = {}
    for coll in ('params', 'batch_stats'):
        if coll not in variables:
            continue
        for path, v in _walk(variables[coll]):
            tkey, _ = _torch_key_and_transform(path, coll)
            a = np.asarray(v)
            if path[-1] == 'kernel':
                if a.ndim == 4:
                    a = np.transpose(a, (3, 2, 0, 1))
                elif a.ndim == 2:
                    a = np.transpose(a, (1, 0))
            out[tkey] = a
    return out


def load_torch_state_dict(path):
    """Load a ``.pth``/``.pth.tar`` checkpoint into numpy arrays.

    Accepts raw state_dicts and reference-style checkpoint dicts with a
    'state_dict' entry; strips DataParallel 'module.' prefixes
    (reference: torchreid/utils/torchtools.py:260-321).
    """
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        if hasattr(v, 'detach'):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    extra = {}
    if isinstance(ckpt, dict):
        extra = {k: v for k, v in ckpt.items() if k != 'state_dict'
                 and not hasattr(v, 'detach')}
    return out, extra
