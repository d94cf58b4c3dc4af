"""ST-GCN action recognizer — the feature extractor behind the PBnet
STGCN metric suite.

Capability port of PBnet/src/recognition/models/stgcn.py:1-219 (model) +
stgcnutils/graph.py:1-175 (skeleton graphs / partition strategies) +
stgcnutils/tgcn.py:34-63 (graph conv unit), consumed by
PBnet/src/evaluate/stgcn/evaluate.py:12-25 to compute recognizer-feature
accuracy / FID / diversity / multimodality.

TPU-native layout: channels-last (N, T, V, C) throughout — the (T, V)
plane is the conv feature map (temporal kernels are (k, 1) convs), the
graph contraction is one einsum over a static (K, V, V) adjacency
stack, and every block is shape-static so the whole recognizer jits to
a single XLA program. Multi-instance input (the reference's M axis) is
fixed at M=1: every motion the DAWN/PBnet eval path scores is a single
skeleton per frame (stgcn.py:87 unsqueeze(4)).

The SMPL layouts in the reference resolve their edge list from a pickled
kintree (graph.py:59-73, models/smpl/kintree_table.pkl) — not shipped in
this image. Instead the graph accepts an explicit ``edges`` list (pass
the kintree pairs to reproduce 'smpl'/'smpl_noglobal' exactly), and the
checkpoint converter (weights/torch_convert.py::convert_stgcn) recovers
``A`` directly from the state_dict's 'A' buffer, so the released
UESTC recognizer loads bit-exactly with no SMPL assets. A DAWN-specific
'dawn_head' layout scores this repo's 6-d pose + 2-d blink sequences.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


# --------------------------------------------------------------------- graphs

def _hop_distance(num_node: int, edges: Sequence[Tuple[int, int]],
                  max_hop: int = 1) -> np.ndarray:
    """BFS hop counts via adjacency powers (graph.py:150-162)."""
    a = np.zeros((num_node, num_node))
    for i, j in edges:
        a[j, i] = 1
        a[i, j] = 1
    hop = np.full((num_node, num_node), np.inf)
    powers = [np.linalg.matrix_power(a, d) for d in range(max_hop + 1)]
    arrive = np.stack(powers) > 0
    for d in range(max_hop, -1, -1):
        hop[arrive[d]] = d
    return hop


def _normalize_digraph(a: np.ndarray) -> np.ndarray:
    """Column-degree normalization A @ D^-1 (graph.py:165-173)."""
    deg = a.sum(0)
    dn = np.zeros_like(a)
    idx = deg > 0
    dn[np.where(idx)[0], np.where(idx)[0]] = deg[idx] ** -1
    return a @ dn


# reference layouts with self-contained edge lists (graph.py:47-95);
# 'smpl'/'smpl_noglobal' need the kintree pickle -> pass edges= instead.
_LAYOUTS: Dict[str, dict] = {
    "openpose": dict(
        num_node=18, center=1,
        neighbors=[(4, 3), (3, 2), (7, 6), (6, 5), (13, 12), (12, 11),
                   (10, 9), (9, 8), (11, 5), (8, 2), (5, 1), (2, 1),
                   (0, 1), (15, 0), (14, 0), (17, 15), (16, 14)]),
    "ntu-rgb+d": dict(
        num_node=25, center=20,
        neighbors=[(i - 1, j - 1) for (i, j) in
                   [(1, 2), (2, 21), (3, 21), (4, 3), (5, 21), (6, 5),
                    (7, 6), (8, 7), (9, 21), (10, 9), (11, 10), (12, 11),
                    (13, 1), (14, 13), (15, 14), (16, 15), (17, 1), (18, 17),
                    (19, 18), (20, 19), (22, 23), (23, 8), (24, 25),
                    (25, 12)]]),
    "ntu_edge": dict(
        num_node=24, center=2,
        neighbors=[(i - 1, j - 1) for (i, j) in
                   [(1, 2), (3, 2), (4, 3), (5, 2), (6, 5), (7, 6), (8, 7),
                    (9, 2), (10, 9), (11, 10), (12, 11), (13, 1), (14, 13),
                    (15, 14), (16, 15), (17, 1), (18, 17), (19, 18),
                    (20, 19), (21, 22), (22, 8), (23, 24), (24, 12)]]),
    # DAWN head-motion graph (this repo's design, no reference analogue):
    # nodes = the 8 PBnet channels [yaw, pitch, roll, tx, ty, tz, blink_l,
    # blink_r] as V=8 / C=1; rotation star at 0, translation star at 3
    # bridged to 0, eyes linked to each other and the rotation root.
    "dawn_head": dict(
        num_node=8, center=0,
        neighbors=[(1, 0), (2, 0), (3, 0), (4, 3), (5, 3),
                   (6, 0), (7, 0), (6, 7)]),
}


def build_graph(layout: str = "openpose", strategy: str = "spatial",
                edges: Optional[Sequence[Tuple[int, int]]] = None,
                num_node: Optional[int] = None, center: int = 0,
                max_hop: int = 1, dilation: int = 1) -> np.ndarray:
    """Adjacency stack A (K, V, V) per graph.py:101-146.

    strategy: 'uniform' (K=1), 'distance' (K=hops), 'spatial'
    (K=1+2*hops: root / centripetal / centrifugal partitions).
    Pass ``edges`` (+ num_node, center) for custom skeletons (e.g. the
    SMPL kintree pairs); otherwise ``layout`` picks a built-in.
    """
    if edges is None:
        spec = _LAYOUTS[layout]
        num_node, center = spec["num_node"], spec["center"]
        neighbors = spec["neighbors"]
    else:
        assert num_node is not None, "explicit edges need num_node"
        neighbors = [tuple(e) for e in edges]
    edge = [(i, i) for i in range(num_node)] + list(neighbors)

    hop = _hop_distance(num_node, edge, max_hop=max_hop)
    valid_hop = range(0, max_hop + 1, dilation)
    adjacency = np.zeros((num_node, num_node))
    for h in valid_hop:
        adjacency[hop == h] = 1
    norm_adj = _normalize_digraph(adjacency)

    if strategy == "uniform":
        return norm_adj[None].astype(np.float32)
    if strategy == "distance":
        a = np.zeros((len(list(valid_hop)), num_node, num_node))
        for i, h in enumerate(valid_hop):
            a[i][hop == h] = norm_adj[hop == h]
        return a.astype(np.float32)
    if strategy == "spatial":
        parts = []
        for h in valid_hop:
            a_root = np.zeros((num_node, num_node))
            a_close = np.zeros((num_node, num_node))
            a_further = np.zeros((num_node, num_node))
            for i in range(num_node):
                for j in range(num_node):
                    if hop[j, i] != h:
                        continue
                    if hop[j, center] == hop[i, center]:
                        a_root[j, i] = norm_adj[j, i]
                    elif hop[j, center] > hop[i, center]:
                        a_close[j, i] = norm_adj[j, i]
                    else:
                        a_further[j, i] = norm_adj[j, i]
            if h == 0:
                parts.append(a_root)
            else:
                parts.append(a_root + a_close)
                parts.append(a_further)
        return np.stack(parts).astype(np.float32)
    raise NotImplementedError(f"strategy {strategy!r}")


# --------------------------------------------------------------------- model

class _STGCNBlock(nn.Module):
    """One st_gcn unit (stgcn.py:139-216): graph conv -> temporal conv,
    BN/ReLU plumbing and the three residual modes."""
    out_channels: int
    spatial_kernel: int            # K = A.shape[0]
    temporal_kernel: int = 9
    stride: int = 1
    residual: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, a: jax.Array, *,
                 train: bool = False) -> jax.Array:
        n, t, v, c = x.shape
        k = self.spatial_kernel
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name)

        if not self.residual:
            res = 0.0
        elif c == self.out_channels and self.stride == 1:
            res = x
        else:
            res = nn.Conv(self.out_channels, (1, 1),
                          strides=(self.stride, 1), name="res_conv")(x)
            res = bn("res_bn")(res)

        # graph conv (tgcn.py:56-63): 1x1 conv to K*C' with K-major channel
        # grouping (torch view(n, K, C', t, v)), then contract neighbors.
        y = nn.Conv(self.out_channels * k, (1, 1), name="gcn_conv")(x)
        y = y.reshape(n, t, v, k, self.out_channels)
        y = jnp.einsum("ntvkc,kvw->ntwc", y, a.astype(y.dtype))

        # tcn Sequential (stgcn.py:176-188): BN, ReLU, (kt,1) conv, BN, drop
        y = bn("tcn_bn1")(y)
        y = jax.nn.relu(y)
        pad = (self.temporal_kernel - 1) // 2
        y = nn.Conv(self.out_channels, (self.temporal_kernel, 1),
                    strides=(self.stride, 1), padding=((pad, pad), (0, 0)),
                    name="tcn_conv")(y)
        y = bn("tcn_bn2")(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return jax.nn.relu(y + res)


class STGCN(nn.Module):
    """Spatial-temporal graph conv recognizer (stgcn.py:11-135).

    Input x: (N, T, V, in_channels) single-skeleton motions. Returns
    {'features': (N, 256) pooled activations — the FID/diversity feature
    space — and 'yhat': (N, num_class) logits}.

    ``graph``: the (K, V, V) adjacency stack from :func:`build_graph` or
    recovered from a reference checkpoint's 'A' buffer. Static (closed
    over by jit), like the reference's registered buffer.
    """
    in_channels: int
    num_class: int
    graph: np.ndarray
    edge_importance_weighting: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Dict[str, jax.Array]:
        a0 = jnp.asarray(np.asarray(self.graph), jnp.float32)
        k, v_nodes, _ = a0.shape
        n, t, v, c = x.shape
        assert v == v_nodes and c == self.in_channels, (x.shape, a0.shape)

        # data_bn (stgcn.py:49,90-92): BatchNorm1d over V*C with channel
        # index v*C + c — exactly the row-major (V, C) flatten here.
        h = x.reshape(n, t, v * c)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="data_bn")(h)
        h = h.reshape(n, t, v, c)

        channels = [(64, 1, False), (64, 1, True), (64, 1, True),
                    (64, 1, True), (128, 2, True), (128, 1, True),
                    (128, 1, True), (256, 2, True), (256, 1, True),
                    (256, 1, True)]
        for i, (out, stride, residual) in enumerate(channels):
            a = a0
            if self.edge_importance_weighting:
                imp = self.param(f"edge_importance_{i}",
                                 nn.initializers.ones, (k, v, v))
                a = a0 * imp
            h = _STGCNBlock(out, spatial_kernel=k, stride=stride,
                            residual=residual,
                            dropout=self.dropout if i > 0 else 0.0,
                            name=f"st_gcn_{i}")(h, a, train=train)

        feats = h.mean(axis=(1, 2))                       # global (T, V) pool
        logits = nn.Conv(self.num_class, (1, 1), name="fcn")(
            feats[:, None, None, :])[:, 0, 0]
        return {"features": feats, "yhat": logits}
