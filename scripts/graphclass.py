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
    ap.add_argument("--ckpt-dir", default="models_ckpt/graphclass")
    ap.add_argument("--epochs", type=int, default=5000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--split-seed", type=int, default=1036)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--no-ell", action="store_true",
                    help="disable the precomputed-ELL scatter-free SpMM path")
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--ema", type=float, default=0.0,
                    help="per-epoch parameter EMA decay (minibatch modes); "
                         "the EMA competes for the best checkpoint")
    ap.add_argument("--extra-train-root", default=None,
                    help="optional second dataset root whose TRAIN split is "
                    "appended to the training graphs (data augmentation)")
    ap.add_argument("--extra-matrices-dir", default=None)
    ap.add_argument("--strict-parity", action="store_true",
                    help="disable log-exinfo conditioning (reference-exact inputs)")
    ap.add_argument("--mlp-baseline", action="store_true",
                    help="extinfo-only MLP-NN ablation (job_MLP_NN.log)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu", "axon"])
    ap.add_argument(
        "--mode", default="loop", choices=["loop", "scan-full", "scan-mini"],
        help="loop: host epoch loop (reference-shaped); scan-full: whole "
        "training as one on-device lax.scan over full-batch epochs; "
        "scan-mini: on-device scan over pre-padded minibatches",
    )
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

    kw = {"log_exinfo": not args.strict_parity, "dropout_rate": args.dropout}
    model = MLPBaseline(**kw) if args.mlp_baseline else ReorderClassifier(**kw)

    if args.mode != "loop":
        import flax.serialization
        import numpy as np

        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train.scan_trainer import (
            fullbatch_fit,
            make_padded_batches,
            minibatch_fit,
            pad_dataset,
        )

        graphs = [train_ds.get(i) for i in range(len(train_ds))]
        if args.extra_train_root:
            roots = args.extra_train_root.split(",")
            mdirs = (args.extra_matrices_dir or "").split(",")
            mdirs += [None] * (len(roots) - len(mdirs))
            for root, mdir in zip(roots, mdirs):
                extra = Classorder(
                    root, 0, split_seed=args.split_seed,
                    matrices_dir=mdir or None,
                )
                graphs += [extra.get(i) for i in range(len(extra))]
                print(f"augmented with {len(extra)} graphs from {root}")
        vg = pad_dataset([val_ds.get(i) for i in range(len(val_ds))])
        t0 = time.time()
        if args.mode == "scan-full":
            tg = pad_dataset(graphs)
            print(f"devices: {jax.devices()}  full-batch: {tg.num_nodes} nodes "
                  f"{tg.num_edges} edges")
            res = fullbatch_fit(
                model, tg, vg, epochs=args.epochs,
                learning_rate=args.lr, weight_decay=args.weight_decay,
                seed=args.seed, progress=True,
            )
        else:
            sb = make_padded_batches(graphs, args.batch_size, seed=args.seed)
            ells = None
            if not args.no_ell and not args.mlp_baseline:
                from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.ell import (
                    ell_pairs_for_batches,
                )
                ells = ell_pairs_for_batches(sb, width=16)
                print(f"ELL tables: {ells[0].senders.shape} per direction")
            print(f"devices: {jax.devices()}  batches: {sb.n_node.shape[0]} x "
                  f"({sb.nodes.shape[1]} nodes, {sb.senders.shape[1]} edges)")
            res = minibatch_fit(
                model, sb, vg, epochs=args.epochs,
                learning_rate=args.lr, weight_decay=args.weight_decay,
                seed=args.seed, progress=True, ells=ells,
                ema_decay=args.ema,
            )
        dt = time.time() - t0
        for e in range(0, args.epochs, max(args.eval_every, 1)):
            print(f"Epoch: {e:04d}, Loss: {res.losses[e]:.4f}, "
                  f"accuracy: {res.val_accuracy[e]:.4f}")
        print(f"best val accuracy: {res.best_val_accuracy:.4f}  "
              f"({args.epochs} epochs in {dt:.0f}s incl. compile)")
        os.makedirs(args.ckpt_dir, exist_ok=True)
        for name, p in [("best", res.best_params), (f"ep{args.epochs}", res.params)]:
            with open(os.path.join(args.ckpt_dir, f"graphmodel_{name}.msgpack"), "wb") as f:
                f.write(flax.serialization.to_bytes({"params": p}))
        np.savez(
            os.path.join(args.ckpt_dir, "train_curve.npz"),
            losses=res.losses, val_accuracy=res.val_accuracy,
        )
        return

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
