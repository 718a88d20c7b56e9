from arco_tpu.data.datasets import (  # noqa: F401
    SliceDataset, SynapseDataset, LAHeartDataset, random_generator_2d)
from arco_tpu.data.samplers import (  # noqa: F401
    TwoStreamBatchSampler, replacement_batches)
from arco_tpu.data.pipeline import TwoStreamPipeline, Prefetcher  # noqa: F401
