"""Training harness: state, steps, loop, checkpoints, loggers, prediction."""
from .state import TrainState, create_train_state, make_optimizer, lr_for_epoch, param_count
from .tasks import GenNerfTask, VoxelNetTask, make_task
from .loop import Trainer
from .checkpoints import CheckpointManager, load_config
from .loggers import (MetricsLogger, CSVLogger, LocalWriter, get_logger,
                      log_hyperparameters)
from .predict import predict_tsdf_volume, decode_dense, dense_grid_points

__all__ = [k for k in dir() if not k.startswith("_")]
