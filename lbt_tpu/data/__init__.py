"""Host-side data pipeline."""

from lbt_tpu.data.datasets import load_dataset, make_augment  # noqa: F401
from lbt_tpu.data.pipeline import batch_iterator  # noqa: F401
