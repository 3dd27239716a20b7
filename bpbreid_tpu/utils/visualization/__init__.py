from bpbreid_tpu.utils.visualization.rankings import visualize_ranking_grid
from bpbreid_tpu.utils.visualization.embeddings import visualize_embeddings_projection
from bpbreid_tpu.utils.visualization.feature_maps import (
    display_feature_maps,
    featuremap_to_heatmap,
)
from bpbreid_tpu.utils.visualization.batch_triplets import (
    display_batch_triplets,
)
