#!/usr/bin/env python
"""Weisfeiler-Lehman subtree kernel — reference ``examples/wl_kernel.py``:
K rounds of WL color refinement, per-graph color histograms, and a
1-nearest-neighbor classifier on the normalized histogram kernel (the
reference fits an SVM; same kernel, simpler classifier, no sklearn)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import WLConv
from examples.mutag_gin import synthetic_mutag


def main():
    graphs = synthetic_mutag(num=120, seed=3)
    y = np.asarray([int(g.y[0]) for g in graphs])

    # disconnected union so one WLConv hashmap colors all graphs jointly
    ss, rs, gid, off = [], [], [], 0
    for i, g in enumerate(graphs):
        n = int(g.n_node[0])
        ss.append(np.asarray(g.senders) + off)
        rs.append(np.asarray(g.receivers) + off)
        gid.append(np.full(n, i))
        off += n
    s = np.concatenate(ss); r = np.concatenate(rs)
    gid = np.concatenate(gid)
    # structure-only WL: uniform initial color (the synthetic classes differ
    # in topology, not node attributes)
    x = np.zeros(len(gid), np.int64)

    wl = WLConv()
    colors = wl(x, s, r)
    hists = [wl.histogram(colors, gid, norm=True)]
    for _ in range(4):
        colors = wl(colors[:, None] == np.arange(len(wl.hashmap)), s, r)
        hists.append(wl.histogram(colors, gid, norm=True))
    # concatenated multi-round histograms = WL subtree feature map
    H = np.concatenate(hists, axis=1)

    K = H @ H.T
    np.fill_diagonal(K, -np.inf)  # leave-one-out 1-NN
    pred = y[K.argmax(1)]
    print(f"WL-kernel 1-NN LOO accuracy: {(pred == y).mean():.4f} "
          f"({len(wl.hashmap)} colors after 5 rounds)")


if __name__ == "__main__":
    main()
