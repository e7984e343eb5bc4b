#!/usr/bin/env python
"""Sharded, crash-resumable training for big generated corpora.

The TPU tunnel in this environment destabilizes under multi-GB single
transfers, so the stacked batch tensor is split into shards; each device call
trains ``--epochs-per-visit`` epochs on one shard and checkpoints params +
optimizer state + progress.  A killed/crashed run resumes exactly where it
stopped (``--resume``), giving the elastic-recovery capability the reference
lacks entirely (SURVEY.md §5).

Usage:
  python scripts/train_sharded.py --cycles 3 --shards 4 --epochs-per-visit 70
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data/ClassorderGen")
    ap.add_argument("--matrices-dir", default="data/ClassorderGen/matrices")
    ap.add_argument("--extra-train-root",
                    default="data/ClassorderGen2k,data/ClassorderGen8k")
    ap.add_argument("--extra-matrices-dir",
                    default="data/ClassorderGen2k/matrices,data/ClassorderGen8k/matrices")
    ap.add_argument("--ckpt-dir", default="models_ckpt/sharded")
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--epochs-per-visit", type=int, default=70)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--dropout", type=float, default=0.3)
    ap.add_argument("--weight-decay", type=float, default=5e-5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--loss", default="nll", choices=["nll", "regret", "soft"])
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--readout", default="max", choices=["max", "meanmax"])
    ap.add_argument("--ema", type=float, default=0.0,
                    help="per-epoch parameter EMA decay; the EMA competes "
                         "for best_params (0 = off)")
    ap.add_argument("--out", default=None,
                    help="final best-checkpoint path (default: "
                         "<ckpt-dir>/graphmodel_best.msgpack)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import Classorder
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models import (
        ReorderClassifier,
        fill_regret_loss,
        masked_nll_loss,
        soft_regret_loss,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train import (
        load_checkpoint,
        save_checkpoint,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train.scan_trainer import (
        make_padded_batches,
        minibatch_fit,
        pad_dataset,
    )

    train_ds = Classorder(args.data_root, 0, matrices_dir=args.matrices_dir)
    val_ds = Classorder(args.data_root, 1, matrices_dir=args.matrices_dir)
    graphs = [train_ds.get(i) for i in range(len(train_ds))]
    for root, mdir in zip(
        args.extra_train_root.split(","), args.extra_matrices_dir.split(",")
    ):
        extra = Classorder(root, 0, matrices_dir=mdir)
        graphs += [extra.get(i) for i in range(len(extra))]
    vg = pad_dataset([val_ds.get(i) for i in range(len(val_ds))])
    print(f"{len(graphs)} training graphs; val={len(val_ds)}")

    sb = make_padded_batches(graphs, args.batch_size, seed=args.seed)
    nb = sb.n_node.shape[0]
    per = -(-nb // args.shards)
    shards = [
        jax.tree_util.tree_map(lambda a: a[i * per : (i + 1) * per], sb)
        for i in range(args.shards)
    ]
    print(f"{nb} batches of ({sb.nodes.shape[1]} nodes, {sb.senders.shape[1]} "
          f"edges) in {args.shards} shards of ~{per}")

    model = ReorderClassifier(
        dropout_rate=args.dropout, hidden=args.hidden, readout=args.readout,
    )
    os.makedirs(args.ckpt_dir, exist_ok=True)
    state_path = osp.join(args.ckpt_dir, "state.msgpack")
    meta_path = osp.join(args.ckpt_dir, "meta.json")

    params = opt_state = None
    best_params, best_acc = None, 0.0
    start_cycle = start_shard = 0
    if osp.exists(meta_path):
        meta = json.load(open(meta_path))
        start_cycle, start_shard = meta["cycle"], meta["shard"]
        best_acc = meta["best_acc"]
        import jax.numpy as jnp

        example = jax.tree_util.tree_map(lambda a: jnp.asarray(a[0]), shards[0])
        params0 = model.init(jax.random.key(args.seed), example)
        import optax

        tx = (optax.adamw(args.lr, weight_decay=args.weight_decay)
              if args.weight_decay else optax.adam(args.lr))
        opt0 = tx.init(params0)
        tpl = {"params": params0, "opt": opt0, "best": params0}
        st = load_checkpoint(state_path, tpl)
        params, opt_state, best_params = st["params"], st["opt"], st["best"]
        print(f"resumed at cycle {start_cycle} shard {start_shard} "
              f"best={best_acc:.4f}")

    t0 = time.time()
    for cycle in range(start_cycle, args.cycles):
        for si in range(start_shard if cycle == start_cycle else 0, args.shards):
            res = minibatch_fit(
                model, shards[si], vg,
                epochs=args.epochs_per_visit,
                loss_fn={"regret": fill_regret_loss, "soft": soft_regret_loss,
                        "nll": masked_nll_loss}[args.loss],
                learning_rate=args.lr, weight_decay=args.weight_decay,
                seed=args.seed + cycle * 100 + si,
                init_params=params, init_opt_state=opt_state,
                init_best=None if best_params is None else (best_params, best_acc),
                ema_decay=args.ema,
            )
            params, opt_state = res.params, res.opt_state
            best_params, best_acc = res.best_params, res.best_val_accuracy
            save_checkpoint(
                state_path, {"params": params, "opt": opt_state, "best": best_params}
            )
            nxt = (cycle, si + 1) if si + 1 < args.shards else (cycle + 1, 0)
            json.dump(
                {"cycle": nxt[0], "shard": nxt[1], "best_acc": float(best_acc)},
                open(meta_path, "w"),
            )
            print(
                f"cycle {cycle} shard {si}: loss={res.losses[-1]:.4f} "
                f"val={res.val_accuracy[-1]:.4f} best={best_acc:.4f} "
                f"[{time.time()-t0:.0f}s]", flush=True,
            )
    import flax.serialization

    out = args.out or osp.join(args.ckpt_dir, "graphmodel_best.msgpack")
    with open(out, "wb") as f:
        f.write(flax.serialization.to_bytes({"params": best_params}))
    print(f"best val accuracy: {best_acc:.4f} -> {out}")


if __name__ == "__main__":
    main()
