from sstem_tpu.data.sim_sff import (
    SimuSFF,
    degrade_sff,
    degrade_sff_batch_jax,
    sample_fold_params,
)
from sstem_tpu.data.providers import (
    Provider,
    InterpTrainDataset,
    UnfoldingTrainDataset,
    FusionTrainDataset,
    InterpValidDataset,
    UnfoldingValidDataset,
    FusionValidDataset,
    SPDataset,
)

__all__ = [
    "SimuSFF",
    "degrade_sff",
    "degrade_sff_batch_jax",
    "sample_fold_params",
    "Provider",
    "InterpTrainDataset",
    "UnfoldingTrainDataset",
    "FusionTrainDataset",
    "InterpValidDataset",
    "UnfoldingValidDataset",
    "FusionValidDataset",
    "SPDataset",
]
