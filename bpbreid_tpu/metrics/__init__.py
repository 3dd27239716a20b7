from bpbreid_tpu.metrics.accuracy import accuracy
from bpbreid_tpu.metrics.distance import (
    compute_distance_matrix,
    compute_distance_matrix_using_bp_features,
    cosine_distance,
    euclidean_squared_distance,
)
from bpbreid_tpu.metrics.rank import evaluate_rank
