"""General-purpose helpers mirroring the reference's ``utils/tools.py``
(reference: torchreid/utils/tools.py:1-187).

``read_image``/``read_masks`` live with the dataset layer
(bpbreid_tpu/data/datasets/dataset.py) and are re-exported here so
callers of the reference's flat namespace find them in one place.
"""
import errno
import os
import os.path as osp
import random
import sys
import warnings

import numpy as np

__all__ = ['mkdir_if_missing', 'check_isfile', 'read_json', 'write_json',
           'set_random_seed', 'download_url', 'collect_env_info',
           'read_image', 'read_masks']


def mkdir_if_missing(dirname):
    """Create a directory if it is missing (reference: tools.py:18-25)."""
    if not osp.exists(dirname):
        try:
            os.makedirs(dirname)
        except OSError as e:
            if e.errno != errno.EEXIST:
                raise


def check_isfile(fpath):
    """True if ``fpath`` is a file; warns otherwise (tools.py:28-41)."""
    isfile = osp.isfile(fpath)
    if not isfile:
        warnings.warn('No file found at "{}"'.format(fpath))
    return isfile


def read_json(fpath):
    import json
    with open(fpath, 'r') as f:
        return json.load(f)


def write_json(obj, fpath):
    import json
    mkdir_if_missing(osp.dirname(fpath))
    with open(fpath, 'w') as f:
        json.dump(obj, f, indent=4, separators=(',', ': '))


def set_random_seed(seed):
    """Seed python/numpy RNGs (reference seeds torch too, tools.py:60-64;
    JAX randomness is explicit via PRNG keys passed through the engine)."""
    random.seed(seed)
    np.random.seed(seed)


def download_url(url, dst):
    """Download a file with a progress meter (tools.py:67-92)."""
    from urllib.request import urlretrieve
    print('* url="{}"'.format(url))
    print('* destination="{}"'.format(dst))

    def _reporthook(count, block_size, total_size):
        import time
        global _start_time
        if count == 0:
            globals()['_start_time'] = time.time()
            return
        duration = time.time() - globals().get('_start_time', time.time())
        progress_size = int(count * block_size)
        speed = int(progress_size / (1024 * max(duration, 1e-9)))
        percent = min(int(count * block_size * 100 / max(total_size, 1)), 100)
        sys.stdout.write(
            '\r...%d%%, %d MB, %d KB/s, %d seconds passed'
            % (percent, progress_size / (1024 * 1024), speed, duration))
        sys.stdout.flush()

    urlretrieve(url, dst, _reporthook)
    sys.stdout.write('\n')


def collect_env_info():
    """Environment summary for logs (reference wraps torch's env collector,
    tools.py:95-100); reports the JAX/TPU stack instead."""
    import platform
    lines = ['python: {}'.format(platform.python_version()),
             'platform: {}'.format(platform.platform())]
    try:
        import jax
        lines.append('jax: {}'.format(jax.__version__))
        try:
            lines.append('devices: {}'.format(
                [str(d) for d in jax.devices()]))
        except Exception as e:                      # device init can fail
            lines.append('devices: unavailable ({})'.format(e))
    except ImportError:
        pass
    try:
        import flax
        lines.append('flax: {}'.format(flax.__version__))
    except ImportError:
        pass
    try:
        import optax
        lines.append('optax: {}'.format(optax.__version__))
    except ImportError:
        pass
    lines.append('numpy: {}'.format(np.__version__))
    return '\n'.join(lines)


def read_image(path):
    from bpbreid_tpu.data.datasets.dataset import read_image as _impl
    return _impl(path)


def read_masks(path):
    from bpbreid_tpu.data.datasets.dataset import read_masks as _impl
    return _impl(path)
