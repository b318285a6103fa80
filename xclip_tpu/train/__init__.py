"""Training subsystem: optax train step over sharded global arrays, Orbax
checkpoint/resume, loss-breakdown metrics."""

from .trainer import (TrainState, create_train_state, default_optimizer,
                      make_train_step, shard_batch, shard_state)
from .checkpoint import restore_checkpoint, save_checkpoint
from .logging import MetricsLogger
from .resilience import CheckpointManager, run_with_recovery, supervise

__all__ = ["TrainState", "create_train_state", "default_optimizer",
           "make_train_step", "shard_batch", "shard_state",
           "restore_checkpoint", "save_checkpoint", "MetricsLogger",
           "CheckpointManager", "run_with_recovery", "supervise"]
