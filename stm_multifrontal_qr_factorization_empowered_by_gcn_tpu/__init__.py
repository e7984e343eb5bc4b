"""TPU-native GNN message-passing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
lsl036/STM-Multifrontal-QR-Factorization-Empowered-by-GCN's GCN classifier
stack (a vendored PyTorch-Geometric 1.6.3 fork + the STM-MQR feature/label
tooling).  See SURVEY.md at the repo root for the full component map.

Short alias: ``import stm_multifrontal_qr_factorization_empowered_by_gcn_tpu
as stmgcn`` (or use the ``stmgcn`` convenience package).
"""
__version__ = "0.1.0"

from . import (  # noqa: F401
    data, datasets, io, models, nn, ops, parallel, sparseqr, train,
    transforms, utils, visualization,
)
from .debug import debug, is_debug_enabled, set_debug  # noqa: F401
