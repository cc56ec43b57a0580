from soundspaces_tpu.config.experiment import (
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    get_config,
    get_overrides,
    merge_config,
)

__all__ = ["DataConfig", "EvalConfig", "ExperimentConfig", "get_config", "get_overrides", "merge_config"]
