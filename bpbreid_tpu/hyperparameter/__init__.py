from bpbreid_tpu.hyperparameter.optimizer import (
    GridSearch,
    HyperParameterOptimizer,
    RandomSearch,
)
from bpbreid_tpu.hyperparameter.clearml_service import (
    ClearMLServiceOptimizer,
    clearml_available,
    clone_task_with_overrides,
)
