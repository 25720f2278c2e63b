"""GNN layers over sampled bipartite blocks (static shapes, mask-correct).

The reference delegates models to PyG (SAGEConv/GATConv used in
examples/pyg/reddit_quiver.py:99, benchmarks/ogbn-mag240m); the TPU
build owns its model zoo (SURVEY.md §7 step 3). Layers implement PyG's
documented math exactly so per-layer activations are allclose to a PyG
oracle:

  SAGEConv (mean aggr):  out = lin_l(mean_{j in N(i)} x_j) + lin_r(x_i)
                         (lin_l with bias, lin_r without — PyG defaults)
  GATConv:               e_ij = LeakyReLU(a_s . (W x_j) + a_d . (W x_i))
                         alpha = softmax_j(e_ij); out_i = sum alpha W x_j
                         (+ bias; no self-loops on bipartite blocks,
                         matching PyG's bipartite behavior)
  RGCNConv (mean aggr):  out_i = W_root x_i + sum_r mean_{j in N_r(i)} W_r x_j

Each layer takes (x_src, adj) where ``adj`` is a ``quiver_tpu.Adj``
block: edge_index[0]=src local id, edge_index[1]=dst local id,
``mask`` kills padded lanes, ``size=(src_cap, dst_cap)``. Destination
nodes are the first ``size[1]`` rows of ``x_src`` (seeds-first
ordering from the sampler).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.segment import segment_mean, segment_sum, segment_max, segment_softmax


def _is_dense(adj) -> bool:
    return hasattr(adj, "fanout")


def _is_csr(adj) -> bool:
    return hasattr(adj, "indptr")


class SAGEConv(nn.Module):
    """GraphSAGE convolution (PyG SAGEConv math; module docstring).

    Performance note: on dense sampled blocks ``aggr="mean"``/``"sum"``
    stream through the lane kernel's custom VJP (~650 GB/s fwd on a
    v5e); ``aggr="max"`` takes the XLA strided-slice lowering
    (~250 GB/s) because its VJP needs argmax bookkeeping the streaming
    kernel doesn't keep — prefer mean/sum on hot training paths.
    """
    out_features: int
    aggr: str = "mean"            # mean | sum | max
    root_weight: bool = True
    use_bias: bool = True
    dtype: object = None          # compute dtype (e.g. jnp.bfloat16)

    @nn.compact
    def __call__(self, x_src, adj):
        dst_cap = adj.size[1]
        if _is_dense(adj):
            # Positional fast path: no edge list, no scatter — the
            # double-buffered lane-streaming Pallas kernel (or its XLA
            # formula off-TPU), ops/lane_kernels.py. Measured 776 GB/s
            # fwd on a v5e vs ~250 GB/s for XLA's strided k-slice fuse.
            if self.aggr not in ("mean", "sum", "max"):
                raise ValueError(f"unknown aggr {self.aggr!r}")
            from ..ops.lane_kernels import lane_aggregate
            agg = lane_aggregate(x_src, adj.mask, self.aggr)
        elif _is_csr(adj):
            # Full-graph block: degree-bucketed gather SpMM (no scatter,
            # no per-edge descriptors) — ops/spmm.py.
            from ..ops.spmm import spmm_csr
            agg = spmm_csr(adj.indptr, adj.indices, x_src, aggr=self.aggr,
                           plan=getattr(adj, "plan", None))
        else:
            src, dst = adj.edge_index[0], adj.edge_index[1]
            msgs = jnp.take(x_src, src, axis=0)
            if self.aggr == "mean":
                agg = segment_mean(msgs, dst, dst_cap, adj.mask)
            elif self.aggr == "sum":
                agg = segment_sum(msgs, dst, dst_cap, adj.mask)
            elif self.aggr == "max":
                agg = segment_max(msgs, dst, dst_cap, adj.mask)
                agg = jnp.where(jnp.isfinite(agg), agg, 0)
            else:
                raise ValueError(f"unknown aggr {self.aggr!r}")
        out = nn.Dense(self.out_features, use_bias=self.use_bias,
                       dtype=self.dtype, name="lin_l")(agg)
        if self.root_weight:
            out = out + nn.Dense(self.out_features, use_bias=False,
                                 dtype=self.dtype,
                                 name="lin_r")(x_src[:dst_cap])
        return out


class GATConv(nn.Module):
    out_features: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    use_bias: bool = True
    dtype: object = None          # compute dtype (e.g. jnp.bfloat16);
    # None = flax promotion (bf16 inputs x f32 params -> f32 compute,
    # 2x the traffic on the attention stream — set bf16 on hot paths)

    @nn.compact
    def __call__(self, x_src, adj):
        H, C = self.heads, self.out_features
        dst_cap = adj.size[1]

        xw2 = nn.Dense(H * C, use_bias=False, dtype=self.dtype,
                       name="lin")(x_src)                         # [N, HC]
        att_src = self.param("att_src", nn.initializers.glorot_uniform(),
                             (1, H, C))
        att_dst = self.param("att_dst", nn.initializers.glorot_uniform(),
                             (1, H, C))

        if _is_dense(adj):
            # Positional fast path: single-pass flash-GAT over the
            # lane-major block (ops/gat_kernels.py) — fused SDDMM +
            # masked softmax + weighted accumulate for all heads, with
            # a custom VJP so training streams at HBM bandwidth (the
            # XLA formula runs off-TPU / for unaligned shapes).
            from ..ops.gat_kernels import flash_gat_lane
            out = flash_gat_lane(xw2, att_src.reshape(1, H * C),
                                 att_dst.reshape(1, H * C), adj.mask,
                                 heads=H,
                                 negative_slope=self.negative_slope)
            out = out.reshape(dst_cap, H, C)
        else:
            xw = xw2.reshape(-1, H, C)
            a_d = (xw[:dst_cap] * att_dst).sum(-1)  # [dst_cap, H]
            if _is_csr(adj):
                # Full-graph block: fused SDDMM + edge softmax +
                # weighted SpMM over the bucketed layout, ALL heads in
                # one pass (one gather serves every head) — gat_csr.
                # a_src=None: the bucketed path recomputes source logits
                # from att_src in-kernel, so the O(N*H*C) eager
                # reduction would be wasted work (the rare tracer
                # fallback computes it itself when needed).
                from ..ops.spmm import gat_csr
                out = gat_csr(adj.indptr, adj.indices, xw, None, a_d,
                              self.negative_slope,
                              plan=getattr(adj, "plan", None),
                              att_src=att_src[0])       # [V, H, C]
            else:
                a_s = (xw * att_src).sum(-1)            # [N, H]
                src, dst = adj.edge_index[0], adj.edge_index[1]
                e = jnp.take(a_s, src, axis=0) + jnp.take(a_d, dst, axis=0)
                e = nn.leaky_relu(e, negative_slope=self.negative_slope)
                alpha = segment_softmax(e, dst, dst_cap, adj.mask)  # [E, H]
                msgs = jnp.take(xw, src, axis=0) * alpha[..., None]
                out = segment_sum(msgs, dst, dst_cap, adj.mask)  # [dst, H, C]

        if self.concat:
            out = out.reshape(dst_cap, H * C)
        else:
            out = out.mean(axis=1)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (H * C if self.concat else C,))
            out = out + bias
        return out


class GCNConv(nn.Module):
    """Graph convolution with symmetric normalization (Kipf & Welling),
    PyG-equivalent math: x'_i = sum_j (1/sqrt(d_i d_j)) W x_j (+ self
    loop when ``add_self_loops``). Degrees are taken from the provided
    ``degree`` array (global in-degrees incl. self-loops); on sampled
    blocks pass the true global degrees so normalization matches
    full-graph semantics.
    """
    out_features: int
    add_self_loops: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x_src, adj, degree_src, degree_dst=None):
        dst_cap = adj.size[1]
        if degree_dst is None:
            degree_dst = degree_src[:dst_cap]
        xw = nn.Dense(self.out_features, use_bias=False, name="lin")(x_src)
        inv_s = jax.lax.rsqrt(jnp.maximum(degree_src.astype(xw.dtype), 1))
        inv_d = jax.lax.rsqrt(jnp.maximum(degree_dst.astype(xw.dtype), 1))
        if _is_csr(adj):
            # Full-graph block: pre/post degree scaling around the
            # bucketed sum-SpMM (ops/spmm.py).
            from ..ops.spmm import spmm_csr
            out = spmm_csr(adj.indptr, adj.indices, xw * inv_s[:, None],
                           aggr="sum",
                           plan=getattr(adj, "plan", None)) * inv_d[:, None]
        elif _is_dense(adj):
            # lane-streaming kernel on the pre-scaled rows (sum aggr)
            from ..ops.lane_kernels import lane_aggregate
            out = lane_aggregate(xw * inv_s[:, None], adj.mask,
                                 "sum") * inv_d[:, None]
        else:
            src, dst = adj.edge_index[0], adj.edge_index[1]
            msgs = jnp.take(xw * inv_s[:, None], src, axis=0)
            out = segment_sum(msgs, dst, dst_cap, adj.mask) * inv_d[:, None]
        if self.add_self_loops:
            out = out + xw[:dst_cap] * (inv_d * inv_d)[:, None]
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_features,))
        return out


class RGCNConv(nn.Module):
    """Relational GCN over typed edges (heterogeneous graphs, MAG240M-style).

    ``adj.e_id`` is reinterpreted by the caller into ``edge_type`` passed
    explicitly; messages are transformed per relation.
    """
    out_features: int
    num_relations: int
    root_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x_src, adj, edge_type):
        dst_cap = adj.size[1]
        R = self.num_relations
        w = self.param("rel_weight", nn.initializers.glorot_uniform(),
                       (R, x_src.shape[-1], self.out_features))
        out = jnp.zeros((dst_cap, self.out_features), x_src.dtype)
        if _is_dense(adj):
            # edge_type: [F, fanout] aligned with the block lanes. ONE
            # pass over the lane rows computes every relation's mean
            # (lane_aggregate_rel, [F, R, D]), then one MXU contraction
            # applies all R relation transforms — vs R full-block
            # streams of the per-relation loop (R x the HBM traffic).
            from ..ops.lane_kernels import lane_aggregate_rel
            agg = lane_aggregate_rel(x_src, adj.mask, edge_type, R,
                                     "mean")                # [F, R, D]
            out = out + jax.lax.dot_general(
                agg.reshape(dst_cap, R * x_src.shape[-1]),
                w.reshape(R * x_src.shape[-1], self.out_features),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x_src.dtype)
        else:
            src, dst = adj.edge_index[0], adj.edge_index[1]
            msgs = jnp.take(x_src, src, axis=0)
            for r in range(R):
                m = adj.mask & (edge_type == r)
                agg = segment_mean(msgs, dst, dst_cap, m)
                out = out + agg @ w[r]
        if self.root_weight:
            out = out + nn.Dense(self.out_features, use_bias=False,
                                 name="lin_root")(x_src[:dst_cap])
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_features,))
        return out
