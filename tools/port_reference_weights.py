"""Port the reference's trained GCN classifier weights into this framework.

Reads a legacy whole-model pickle (``GCN_classifier/models/graphmodel_ep*.torch``,
the artifact ``testgraph.py:90`` loads) through the restricted parser in
``io/torch_legacy.py`` (no torch, no reference code execution) and emits the
equivalent flax parameter pytree for :class:`ReorderClassifier` — satisfying
the BASELINE.md target "match reference per-layer activations (allclose) with
loaded reference weights" (verified by ``tests/test_reference_parity.py``).

Mapping (torch ``Linear.weight`` is ``[out, in]``; flax kernels are
``[in, out]``):

========================  =====================================
reference state_dict       ReorderClassifier params
========================  =====================================
convK.lin_l.weight (T)     convK.lin_l_weight
convK.lin_l.bias           convK.lin_l_bias
convK.lin_r.weight (T)     convK.lin_r_weight
linK.weight (T)            linK.kernel
linK.bias                  linK.bias
poolK.weight               (unused — test-time net skips TopK,
                            SURVEY.md §3.6; kept for completeness)
========================  =====================================

Usage::

    python tools/port_reference_weights.py \
        [--ckpt /root/reference/GCN_classifier/models/graphmodel_ep5000.torch] \
        [--out models_ckpt/reference_ep5000_ported.msgpack]
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.torch_legacy import (
    load_legacy_torch,
    module_parameters,
)

DEFAULT_CKPT = "/root/reference/GCN_classifier/models/graphmodel_ep5000.torch"


def port_reference_params(ckpt_path: str = DEFAULT_CKPT) -> dict:
    """Return ``{'params': ...}`` for ``ReorderClassifier(readout='max',
    log_exinfo=False)`` — the strict-parity configuration."""
    model = load_legacy_torch(ckpt_path)
    sd = module_parameters(model)

    def conv(name: str) -> dict:
        return {
            "lin_l_weight": np.ascontiguousarray(sd[f"{name}.lin_l.weight"].T),
            "lin_l_bias": sd[f"{name}.lin_l.bias"],
            "lin_r_weight": np.ascontiguousarray(sd[f"{name}.lin_r.weight"].T),
        }

    def dense(name: str) -> dict:
        return {
            "kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
            "bias": sd[f"{name}.bias"],
        }

    return {
        "params": {
            "conv1": conv("conv1"),
            "conv2": conv("conv2"),
            "lin1": dense("lin1"),
            "lin2": dense("lin2"),
            "lin3": dense("lin3"),
        }
    }


def reference_state_dict(ckpt_path: str = DEFAULT_CKPT) -> dict:
    """Raw ``{path: numpy}`` view of the reference checkpoint (incl. the
    TopKPooling score vectors the test-time architecture never uses)."""
    return module_parameters(load_legacy_torch(ckpt_path))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=DEFAULT_CKPT)
    ap.add_argument(
        "--out", default=osp.join(osp.dirname(__file__), "..", "models_ckpt",
                                  "reference_ep5000_ported.msgpack")
    )
    args = ap.parse_args()

    params = port_reference_params(args.ckpt)
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train.checkpoint import (
        save_checkpoint,
    )

    save_checkpoint(args.out, params)
    total = sum(int(np.prod(v.shape)) for v in
                _leaves(params["params"]))
    print(f"ported {total} parameters from {args.ckpt} -> {args.out}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
