from tpuflow.configs.config import (
    CaseConfig,
    DataConfig,
    EvalConfig,
    ModelConfig,
    TrainConfig,
    load_case,
    case_names,
)

__all__ = [
    "CaseConfig",
    "DataConfig",
    "EvalConfig",
    "ModelConfig",
    "TrainConfig",
    "load_case",
    "case_names",
]
