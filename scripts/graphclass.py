#!/usr/bin/env python
"""Train the GCN reordering classifier — reference ``GCN_classifier/graphclass.py``.

Defaults mirror the reference hyperparameters (``graphclass.py:22-25``):
batch 4, Adam lr 1e-4, 5000 epochs, checkpoints every epochs/10, accuracy
print every 10 epochs.

Usage:
    python scripts/graphclass.py --epochs 200 --platform cpu
    python scripts/graphclass.py                      # full run, TPU
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data/Classorder")
    ap.add_argument("--matrices-dir", default="data/matrices")
    ap.add_argument("--ckpt-dir", default="models_ckpt")
    ap.add_argument("--epochs", type=int, default=5000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--split-seed", type=int, default=1036)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--strict-parity", action="store_true",
                    help="disable log-exinfo conditioning (reference-exact inputs)")
    ap.add_argument("--mlp-baseline", action="store_true",
                    help="extinfo-only MLP-NN ablation (job_MLP_NN.log)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu", "axon"])
    args = ap.parse_args()

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import DataLoader
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import Classorder
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models.reorder_classifier import (
        MLPBaseline,
        ReorderClassifier,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train.trainer import Trainer

    train_ds = Classorder(args.data_root, 0, split_seed=args.split_seed,
                          matrices_dir=args.matrices_dir)
    val_ds = Classorder(args.data_root, 1, split_seed=args.split_seed,
                        matrices_dir=args.matrices_dir)
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True, seed=args.seed)
    val_loader = DataLoader(val_ds, args.batch_size)

    kw = {"log_exinfo": not args.strict_parity}
    model = MLPBaseline(**kw) if args.mlp_baseline else ReorderClassifier(**kw)
    trainer = Trainer(model, learning_rate=args.lr, seed=args.seed)

    example = next(iter(train_loader))
    trainer.init(example)
    print(f"devices: {jax.devices()}  model: {type(model).__name__}  "
          f"train/val: {len(train_ds)}/{len(val_ds)}")

    ckpt_every = max(args.epochs // 10, 1)
    best = 0.0
    t0 = time.time()
    for epoch in range(args.epochs):
        loss = trainer.train_epoch(train_loader)
        if epoch % ckpt_every == 0:
            trainer.save(os.path.join(args.ckpt_dir, f"graphmodel_ep{epoch}.msgpack"))
        if epoch % args.eval_every == 0:
            c, t = trainer.evaluate(val_loader)
            tc, tt = trainer.evaluate(train_loader)
            acc = c / max(t, 1)
            if acc > best:
                best = acc
                trainer.save(os.path.join(args.ckpt_dir, "graphmodel_best.msgpack"))
            print(
                f"Epoch: {epoch:03d}, Loss: {loss:.4f}, "
                f"total_correct: {c}, total_examples: {t}, "
                f"accuracy: {acc:.4f} Train_accuracy: {tc / max(tt, 1):.4f} "
                f"[{time.time() - t0:.0f}s]"
            )
    trainer.save(os.path.join(args.ckpt_dir, f"graphmodel_ep{args.epochs}.msgpack"))
    print(f"best val accuracy: {best:.4f}")


if __name__ == "__main__":
    main()
