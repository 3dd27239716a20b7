from bpbreid_tpu.data.datamanager import DataManager, ImageDataManager
from bpbreid_tpu.data.datasets import (
    init_image_dataset,
    get_image_dataset,
    register_image_dataset,
)
from bpbreid_tpu.data.loader import BatchLoader
from bpbreid_tpu.data.video import (
    VideoDataManager,
    VideoDataset,
    init_video_dataset,
    register_video_dataset,
)
import bpbreid_tpu.data.datasets.video_datasets  # noqa: F401  (registry)
from bpbreid_tpu.data.sampler import (
    RandomIdentitySampler,
    RandomSampler,
    SequentialSampler,
    build_train_sampler,
)
