"""JumpingKnowledge, DeepGraphInfomax, LabelPropagation, CorrectAndSmooth,
GraphUNet — reference ``torch_geometric/nn/models/{jumping_knowledge,
deep_graph_infomax,label_prop,correct_and_smooth,graph_unet}.py``."""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops.norm import gcn_norm
from ...ops.spmm import spmm_coo
from ..conv.gcn_conv import GCNConv
from ..message_passing import resolve_graph_args
from ..pool.topk_pool import topk_pool


class JumpingKnowledge(nn.Module):
    """Combine per-layer representations: 'cat' | 'max' | 'lstm'."""

    mode: str = "cat"
    channels: Optional[int] = None  # required for lstm

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        if self.mode == "cat":
            return jnp.concatenate(list(xs), axis=-1)
        if self.mode == "max":
            return jnp.max(jnp.stack(list(xs), axis=0), axis=0)
        if self.mode == "lstm":
            if self.channels is None:
                raise ValueError("channels required for lstm mode")
            x = jnp.stack(list(xs), axis=1)  # [N, L, F]
            # bidirectional LSTM attention over layers (reference :55-70)
            fwd = nn.RNN(nn.LSTMCell(features=self.channels))(x)
            bwd = nn.RNN(nn.LSTMCell(features=self.channels), reverse=True)(x)
            alpha = nn.Dense(1)(jnp.concatenate([fwd, bwd], axis=-1))[..., 0]
            alpha = jax.nn.softmax(alpha, axis=-1)
            return jnp.sum(x * alpha[..., None], axis=1)
        raise ValueError(f"unknown mode {self.mode!r}")


class DeepGraphInfomax(nn.Module):
    """DGI: encoder embeddings vs corrupted embeddings against a readout
    summary via a bilinear discriminator."""

    hidden_channels: int
    encoder: Callable
    summary_fn: Callable = lambda z: jax.nn.sigmoid(jnp.mean(z, axis=0))
    corruption: Optional[Callable] = None

    @nn.compact
    def __call__(self, *args, corrupt_key=None, **kwargs):
        pos_z = self.encoder(*args, **kwargs)
        if self.corruption is not None:
            cor_args = self.corruption(corrupt_key, *args)
        else:  # default: permute node features (reference DGI corruption)
            x = args[0]
            perm = jax.random.permutation(corrupt_key, x.shape[0])
            cor_args = (x[perm],) + tuple(args[1:])
        neg_z = self.encoder(*cor_args, **kwargs)
        summary = self.summary_fn(pos_z)
        return pos_z, neg_z, summary

    def discriminate(self, z, summary, params_w):
        return jax.nn.sigmoid(z @ params_w @ summary)


def dgi_loss(pos_z, neg_z, summary, w):
    """Deep-Graph-Infomax BCE loss over positive/corrupted summaries (reference ``nn/models/deep_graph_infomax.py``)."""
    eps = 1e-15
    pos = jax.nn.sigmoid(pos_z @ w @ summary)
    neg = jax.nn.sigmoid(neg_z @ w @ summary)
    return -jnp.mean(jnp.log(pos + eps)) - jnp.mean(jnp.log(1 - neg + eps))


class LabelPropagation(nn.Module):
    """y' = α·Â·y + (1−α)·y iterated K times (parameter-free)."""

    num_layers: int
    alpha: float = 0.9

    def __call__(
        self,
        y: jnp.ndarray,
        graph_or_senders: Union[Graph, jnp.ndarray],
        receivers: Optional[jnp.ndarray] = None,
        *,
        label_mask: Optional[jnp.ndarray] = None,
        num_nodes: Optional[int] = None,
        edge_mask: Optional[jnp.ndarray] = None,
        post_step: Callable = lambda y: jnp.clip(y, 0.0, 1.0),
    ) -> jnp.ndarray:
        _, senders, receivers, num_nodes, edge_mask, _ = resolve_graph_args(
            y, graph_or_senders, receivers, num_nodes, edge_mask
        )
        if label_mask is not None:
            y = jnp.where(label_mask[:, None], y, 0)
        ew, _ = gcn_norm(
            senders, receivers, num_nodes, edge_mask=edge_mask, add_self_loops=False
        )
        out = y
        for _ in range(self.num_layers):
            prop = spmm_coo(
                out, senders, receivers, num_nodes, edge_weight=ew, edge_mask=edge_mask
            )
            out = post_step(self.alpha * prop + (1 - self.alpha) * y)
        return out


class CorrectAndSmooth(nn.Module):
    """C&S post-processing: residual-error correction + label smoothing over
    the graph (reference ``correct_and_smooth.py``)."""

    num_correction_layers: int = 50
    correction_alpha: float = 0.979
    num_smoothing_layers: int = 50
    smoothing_alpha: float = 0.756
    autoscale: bool = True
    scale: float = 20.0

    def correct(self, y_soft, y_true, train_mask, graph, **kw):
        err = jnp.where(train_mask[:, None], y_true - y_soft, 0)
        # parent=None: C&S is parameter-free and usable unbound; without it
        # flax tries to register the child in a scope that doesn't exist
        prop = LabelPropagation(self.num_correction_layers,
                                self.correction_alpha, parent=None)
        err = prop(err, graph, post_step=lambda e: e, **kw)
        if self.autoscale:
            sigma = jnp.sum(jnp.abs(err) * train_mask[:, None]) / jnp.maximum(
                jnp.sum(train_mask), 1
            )
            scale = sigma / jnp.maximum(
                jnp.sum(jnp.abs(err), axis=-1, keepdims=True), 1e-9
            )
            return y_soft + jnp.clip(scale, a_max=1000) * err
        return y_soft + self.scale * err

    def smooth(self, y_soft, y_true, train_mask, graph, **kw):
        y = jnp.where(train_mask[:, None], y_true, y_soft)
        prop = LabelPropagation(self.num_smoothing_layers,
                                self.smoothing_alpha, parent=None)
        return prop(y, graph, **kw)


class GraphUNet(nn.Module):
    """Graph U-Net (reference ``graph_unet.py``): GCN + TopK down path, skip
    connections, additive up path.  Static budgets: pooled graphs keep the
    input's padded shapes, so all depths share one compilation."""

    in_channels: int
    hidden_channels: int
    out_channels: int
    depth: int
    pool_ratios: Union[float, Sequence[float]] = 0.5
    sum_res: bool = True
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, g: Graph, x: Optional[jnp.ndarray] = None, *, train: bool = False):
        from ..pool.topk_pool import TopKPooling

        x = g.nodes if x is None else x
        ratios = (
            [self.pool_ratios] * self.depth
            if isinstance(self.pool_ratios, float)
            else list(self.pool_ratios)
        )
        x = self.act(GCNConv(self.in_channels, self.hidden_channels, name="down_0")(x, g))
        cur = g.replace(nodes=x)
        xs, perms, level_graphs = [x], [], [cur]
        for d in range(1, self.depth + 1):
            pooled = TopKPooling(self.hidden_channels, ratios[d - 1], name=f"pool_{d}")(cur)
            cur = pooled.graph
            perms.append(pooled.perm)
            h = self.act(
                GCNConv(self.hidden_channels, self.hidden_channels, name=f"down_{d}")(
                    cur.nodes, cur
                )
            )
            cur = cur.replace(nodes=h)
            level_graphs.append(cur)
            if d < self.depth:
                xs.append(h)

        h = cur.nodes
        for d in range(self.depth, 0, -1):
            res = xs[d - 1]
            g_up = level_graphs[d - 1]
            perm = perms[d - 1]
            # un-pool: scatter pooled rows back to their pre-pool positions;
            # zero invalid rows first (padding perm entries all alias the last
            # padding node, so they must carry 0)
            valid = jnp.arange(h.shape[0]) < jnp.sum(level_graphs[d].n_node)
            h_valid = jnp.where(valid[:, None], h, 0)
            up = jnp.zeros_like(res)
            up = up.at[perm].set(h_valid[: perm.shape[0]])
            h = up + res if self.sum_res else jnp.concatenate([up, res], axis=-1)
            in_ch = self.hidden_channels if self.sum_res else 2 * self.hidden_channels
            out_ch = self.out_channels if d == 1 else self.hidden_channels
            h = GCNConv(in_ch, out_ch, name=f"up_{d}")(h, g_up)
            if d > 1:
                h = self.act(h)
        return h


class DeepGCNLayer(nn.Module):
    """DeepGCN skip-connection wrapper — reference
    ``nn/models/deepgcn.py:6-106``: ``res+`` (pre-activation: norm → act →
    dropout → conv → +x), ``res``, ``dense`` (concat) and ``plain`` blocks.
    The reference's ``ckpt_grad`` (torch ``checkpoint``) maps to
    ``jax.checkpoint`` rematerialization — the TPU-native memory/compute
    trade for going deep."""

    conv: Callable
    norm: Optional[Callable] = None
    act: Optional[Callable] = None
    block: str = "res+"
    dropout: float = 0.0
    ckpt_grad: bool = False

    @nn.compact
    def __call__(self, x, *args, train: bool = False, **kwargs):
        assert self.block in ("res+", "res", "dense", "plain")
        if self.ckpt_grad:
            # lifted remat: flax's jax.checkpoint for submodules
            rematted = nn.remat(lambda mdl, h: mdl(h, *args, **kwargs))

            def conv_fn(h):
                return rematted(self.conv, h)
        else:
            def conv_fn(h):
                return self.conv(h, *args, **kwargs)

        if self.block == "res+":
            h = x
            if self.norm is not None:
                h = self.norm(h)
            if self.act is not None:
                h = self.act(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            return x + conv_fn(h)

        h = conv_fn(x)
        if self.norm is not None:
            h = self.norm(h)
        if self.act is not None:
            h = self.act(h)
        if self.block == "res":
            h = x + h
        elif self.block == "dense":
            h = jnp.concatenate([x, h], axis=-1)
        return nn.Dropout(self.dropout, deterministic=not train)(h)
