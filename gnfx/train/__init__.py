"""Training: loops, checkpointing, metrics."""

from gnfx.train.checkpoint import save_checkpoint, restore_checkpoint, latest_step  # noqa: F401
from gnfx.train.metrics import MetricsWriter  # noqa: F401
