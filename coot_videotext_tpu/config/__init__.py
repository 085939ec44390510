from coot_videotext_tpu.config.base import (
    BaseDatasetConfig, BaseExperimentConfig, BaseLoggingConfig,
    BaseSavingConfig, BaseTrainConfig, BaseTrainerState, BaseValConfig,
    DefaultExperimentConfig, OptimizerConfig, OptimizerConst, SchedulerConfig,
    SchedulerConst, SchedulerWarmupConst)

__all__ = [
    "BaseDatasetConfig", "BaseExperimentConfig", "BaseLoggingConfig",
    "BaseSavingConfig", "BaseTrainConfig", "BaseTrainerState", "BaseValConfig",
    "DefaultExperimentConfig", "OptimizerConfig", "OptimizerConst",
    "SchedulerConfig", "SchedulerConst", "SchedulerWarmupConst",
]
