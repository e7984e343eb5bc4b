"""Training loops (host epoch loop + whole-run on-device ``lax.scan``),
atomic msgpack checkpointing with optimizer state, EMA.
"""
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .scan_trainer import (
    FitResult,
    fullbatch_fit,
    make_padded_batches,
    minibatch_fit,
    pad_dataset,
)
from .sampled_scan import (
    make_dp_scanned_sampled_trainer,
    make_scanned_sampled_trainer,
)
from .trainer import Trainer

__all__ = [
    "Trainer",
    "make_scanned_sampled_trainer",
    "make_dp_scanned_sampled_trainer",
    "FitResult",
    "fullbatch_fit",
    "make_padded_batches",
    "minibatch_fit",
    "pad_dataset",
    "latest_checkpoint",
    "load_checkpoint",
    "save_checkpoint",
]
