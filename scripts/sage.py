#!/usr/bin/env python
"""Train the node-scoring reorder net — reference ``GCN_classifier/sage.py``
(the commented-out training twin of testsage.py, revived here).

Usage: python scripts/sage.py --epochs 450 [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data/Reorder")
    ap.add_argument("--matrices-dir", default="data/matrices")
    ap.add_argument("--ckpt-dir", default="models_ckpt")
    ap.add_argument("--epochs", type=int, default=450)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import flax.serialization
    import numpy as np

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets.reorder import Reorder
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models.sage_order import (
        SageOrderNet,
        order_mse_loss,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train.scan_trainer import (
        fullbatch_fit,
        pad_dataset,
    )

    train_ds = Reorder(args.data_root, 0, matrices_dir=args.matrices_dir)
    val_ds = Reorder(args.data_root, 1, matrices_dir=args.matrices_dir)
    tg = pad_dataset([train_ds.get(i) for i in range(len(train_ds))])
    vg = pad_dataset([val_ds.get(i) for i in range(len(val_ds))])
    model = SageOrderNet()

    t0 = time.time()
    res = fullbatch_fit(
        model, tg, vg, epochs=args.epochs, learning_rate=args.lr,
        seed=args.seed, loss_fn=order_mse_loss, progress=True,
        # val "accuracy" here is meaningless for regression; losses matter
    )
    print(f"train loss {res.losses[0]:.4f} -> {res.losses[-1]:.4f} "
          f"in {time.time()-t0:.0f}s")
    os.makedirs(args.ckpt_dir, exist_ok=True)
    with open(os.path.join(args.ckpt_dir, "sage_order.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes({"params": res.params}))
    np.savez(os.path.join(args.ckpt_dir, "sage_curve.npz"), losses=res.losses)


if __name__ == "__main__":
    main()
