"""Batch inference over folders of person crops -> saved ``.npy``
features for tracking pipelines.

Mirror of the reference tool
(reference: torchreid/tools/extract_part_based_features.py:10-79):
writes ``embeddings_<name>.npy``, ``visibility_scores_<name>.npy`` and
``parts_masks_<name>.npy`` per input folder.
"""
import glob
import os
import os.path as osp

import numpy as np

from bpbreid_tpu.constants import bn_correspondants

__all__ = ['extract_reid_features']


def extract_reid_features(cfg, input_folder, output_folder, model=None,
                          engine=None, chunk_size=50):
    from bpbreid_tpu.tools.feature_extractor import FeatureExtractor
    import jax.numpy as jnp

    extractor = FeatureExtractor(cfg, model=model, engine=engine)
    image_list = sorted(
        glob.glob(osp.join(input_folder, '**', '*.jpg'), recursive=True)
        + glob.glob(osp.join(input_folder, '**', '*.png'), recursive=True))
    if not image_list:
        print('No images found under {}'.format(input_folder))
        return

    test_embeddings = cfg.model.bpbreid.test_embeddings
    all_embeddings, all_vis, all_masks = [], [], []
    for i in range(0, len(image_list), chunk_size):
        chunk = image_list[i:i + chunk_size]
        outputs = extractor(chunk)
        embeddings, visibility, _cls, _pix, _feat, masks = outputs
        emb_list, vis_list = [], []
        for key in test_embeddings:
            e = np.asarray(embeddings[key])
            emb_list.append(e if e.ndim == 3 else e[:, None, :])
            raw = bn_correspondants.get(key, key)
            v = np.asarray(visibility[raw]).astype(np.float32)
            vis_list.append(v if v.ndim == 2 else v[:, None])
        all_embeddings.append(np.concatenate(emb_list, axis=1))
        all_vis.append(np.concatenate(vis_list, axis=1))
        from bpbreid_tpu.constants import PARTS
        all_masks.append(np.asarray(masks[PARTS]))

    name = osp.basename(osp.normpath(input_folder))
    os.makedirs(output_folder, exist_ok=True)
    emb = np.concatenate(all_embeddings)
    vis = np.concatenate(all_vis)
    msk = np.concatenate(all_masks)
    np.save(osp.join(output_folder, 'embeddings_{}.npy'.format(name)), emb)
    np.save(osp.join(output_folder,
                     'visibility_scores_{}.npy'.format(name)), vis)
    np.save(osp.join(output_folder, 'parts_masks_{}.npy'.format(name)), msk)
    with open(osp.join(output_folder,
                       'image_list_{}.txt'.format(name)), 'w') as f:
        f.write('\n'.join(image_list))
    print('Saved features for {} images to {}'.format(len(image_list),
                                                      output_folder))
    return emb, vis, msk
