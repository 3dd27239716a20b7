from bpbreid_tpu.hyperparameter.optimizer import (
    GridSearch,
    HyperParameterOptimizer,
    RandomSearch,
)
