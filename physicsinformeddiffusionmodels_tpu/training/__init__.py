"""Training loop components: optimizer, train step, checkpointing, metrics."""

from physicsinformeddiffusionmodels_tpu.training.trainer import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_chunked_resident_step,
    make_device_resident_step,
    make_train_step,
)
from physicsinformeddiffusionmodels_tpu.training.shutdown import (
    install_graceful_stop,
)
from physicsinformeddiffusionmodels_tpu.training.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    restore_train_state,
    save_checkpoint,
)
from physicsinformeddiffusionmodels_tpu.training.metrics import MetricsLogger

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_chunked_resident_step",
    "make_device_resident_step",
    "make_train_step",
    "install_graceful_stop",
    "latest_checkpoint",
    "load_checkpoint",
    "restore_train_state",
    "save_checkpoint",
    "MetricsLogger",
]
