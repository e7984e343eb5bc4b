from .reorder_classifier import (
    MLPBaseline,
    fill_regret_loss,
    soft_regret_loss,
    ReorderClassifier,
    masked_accuracy,
    masked_nll_loss,
)
from .sage_order import (
    SageOrderNet,
    order_mse_loss,
    order_position_accuracy,
    predicted_ordering,
)

__all__ = [
    "MLPBaseline",
    "ReorderClassifier",
    "masked_accuracy",
    "masked_nll_loss",
    "fill_regret_loss",
    "soft_regret_loss",
    "SageOrderNet",
    "order_mse_loss",
    "order_position_accuracy",
    "predicted_ordering",
]
