"""Datasets: GraphRNN-lineage generators, batching, and citation graphs."""

from gnfx.data.generators import create_dataset, DATASETS  # noqa: F401
from gnfx.data.batching import (  # noqa: F401
    dataset_to_arrays,
    batch_iterator,
    empirical_size_distribution,
)
