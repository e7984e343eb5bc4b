from .reorder_classifier import (
    ReorderClassifier, MLPBaseline, masked_nll_loss, masked_accuracy,
)

__all__ = ["ReorderClassifier", "MLPBaseline", "masked_nll_loss", "masked_accuracy"]
