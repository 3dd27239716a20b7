from bpbreid_tpu.losses.bpa import BodyPartAttentionLoss
from bpbreid_tpu.losses.cross_entropy import CrossEntropyLoss, cross_entropy_loss
from bpbreid_tpu.losses.gilt import GiLtLoss
from bpbreid_tpu.losses.triplet import (
    InterPartsTripletLoss,
    PartAveragedTripletLoss,
    PartIndividualTripletLoss,
    PartMaxMinTripletLoss,
    PartMaxTripletLoss,
    PartMinTripletLoss,
    PartRandomMaxMinTripletLoss,
    TripletLoss,
    init_part_based_triplet_loss,
)


def deep_supervision(criterion, xs, y):
    """Apply criterion to each element in xs and average
    (reference: torchreid/losses/__init__.py DeepSupervision)."""
    total = 0.0
    for x in xs:
        total = total + criterion(x, y)
    return total / len(xs)
