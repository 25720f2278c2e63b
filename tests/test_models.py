"""Model-layer parity tests: per-layer activations allclose vs a numpy
oracle implementing PyG's documented formulas (the north-star parity
check, SURVEY.md §7 step 3), plus an end-to-end learning test on a
planted-community graph (analogue of the reference's accuracy checks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quiver_tpu import CSRTopo, NeighborSampler
from quiver_tpu.models import SAGEConv, GATConv, GraphSAGE
from quiver_tpu.models.nets import full_graph_adj
from quiver_tpu.sampling.sampler import Adj


def _rand_block(rng, n_src, n_dst, n_edges, d):
    src = rng.integers(0, n_src, n_edges).astype(np.int32)
    dst = rng.integers(0, n_dst, n_edges).astype(np.int32)
    mask = rng.random(n_edges) > 0.2
    x = rng.normal(size=(n_src, d)).astype(np.float32)
    adj = Adj(edge_index=jnp.asarray(np.stack([src, dst])),
              e_id=jnp.arange(n_edges, dtype=jnp.int32),
              mask=jnp.asarray(mask),
              size=(n_src, n_dst),
              counts=jnp.array([n_src, n_dst], np.int32))
    return x, adj, src, dst, mask


def _np_sage(x, src, dst, mask, n_dst, Wl, bl, Wr):
    """PyG SAGEConv oracle: lin_l(mean_j x_j) + lin_r(x_i)."""
    d_out = Wl.shape[1]
    agg = np.zeros((n_dst, x.shape[1]), np.float32)
    cnt = np.zeros(n_dst, np.float32)
    for e in range(len(src)):
        if mask[e]:
            agg[dst[e]] += x[src[e]]
            cnt[dst[e]] += 1
    agg = agg / np.maximum(cnt, 1)[:, None]
    return agg @ Wl + bl + x[:n_dst] @ Wr


def test_sageconv_matches_pyg_oracle():
    rng = np.random.default_rng(0)
    x, adj, src, dst, mask = _rand_block(rng, 30, 10, 100, 8)
    layer = SAGEConv(16)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), adj)
    out = np.asarray(layer.apply(params, jnp.asarray(x), adj))

    p = params["params"]
    Wl = np.asarray(p["lin_l"]["kernel"])
    bl = np.asarray(p["lin_l"]["bias"])
    Wr = np.asarray(p["lin_r"]["kernel"])
    ref = _np_sage(x, src, dst, mask, 10, Wl, bl, Wr)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_gatconv_matches_pyg_oracle():
    rng = np.random.default_rng(1)
    H, C, D = 2, 5, 7
    x, adj, src, dst, mask = _rand_block(rng, 20, 8, 60, D)
    layer = GATConv(C, heads=H, concat=True)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), adj)
    out = np.asarray(layer.apply(params, jnp.asarray(x), adj))

    p = params["params"]
    W = np.asarray(p["lin"]["kernel"])              # [D, H*C]
    a_s = np.asarray(p["att_src"]).reshape(H, C)
    a_d = np.asarray(p["att_dst"]).reshape(H, C)
    bias = np.asarray(p["bias"])
    xw = (x @ W).reshape(-1, H, C)
    alpha_s = (xw * a_s).sum(-1)                    # [N, H]
    alpha_d = (xw[:8] * a_d).sum(-1)                # [8, H]
    ref = np.zeros((8, H, C), np.float32)
    for i in range(8):
        es = [e for e in range(len(src)) if mask[e] and dst[e] == i]
        if not es:
            continue
        logits = np.array([alpha_s[src[e]] + alpha_d[i] for e in es])
        logits = np.where(logits > 0, logits, 0.2 * logits)  # leaky relu
        w = np.exp(logits - logits.max(0))
        w = w / w.sum(0)
        for h in range(H):
            ref[i, :, :][h] = sum(w[j, h] * xw[src[es[j]], h]
                                  for j in range(len(es)))
    ref = ref.reshape(8, H * C) + bias
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def _community_graph(rng, n=200, classes=4, d=16, p_in=0.2, p_out=0.01):
    labels = rng.integers(0, classes, n)
    rows, cols = [], []
    for i in range(n):
        same = np.where(labels == labels[i])[0]
        diff = np.where(labels != labels[i])[0]
        rows += [i] * 6
        cols += list(rng.choice(same, 5)) + [int(rng.choice(diff))]
    feat = np.eye(classes, dtype=np.float32)[labels]
    feat = feat + rng.normal(scale=0.5, size=(n, classes)).astype(np.float32)
    feat = np.concatenate(
        [feat, rng.normal(size=(n, d - classes)).astype(np.float32)], 1)
    topo = CSRTopo(edge_index=np.stack([np.array(rows), np.array(cols)]),
                   num_nodes=n)
    return topo, feat, labels


def test_end_to_end_training_learns():
    """2-layer GraphSAGE on a planted-community graph must beat 90% train
    accuracy in a few hundred steps (e2e slice, SURVEY.md §7 step 3)."""
    import optax

    rng = np.random.default_rng(0)
    topo, feat, labels = _community_graph(rng)
    n = topo.node_count
    sampler = NeighborSampler(topo, [5, 5], mode="TPU", seed=0, dedup="none")
    model = GraphSAGE(hidden_features=32, out_features=4, num_layers=2,
                      dropout=0.0)

    batch = sampler.sample(np.arange(64))
    x0 = jnp.asarray(feat)[jnp.clip(batch.n_id, 0, n - 1)]
    params = model.init(jax.random.PRNGKey(0), x0, batch.adjs)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, adjs, y, w):
        def loss_fn(p):
            logits = model.apply(p, x, adjs)[:y.shape[0]]
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * w).sum() / jnp.maximum(w.sum(), 1), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, logits

    feat_j = jnp.asarray(feat)
    labels_j = jnp.asarray(labels)
    accs = []
    for it in range(120):
        seeds = rng.choice(n, 64, replace=False)
        b = sampler.sample(seeds)
        x = feat_j[jnp.clip(b.n_id, 0, n - 1)]
        y = labels_j[jnp.asarray(seeds)]
        w = jnp.ones(64, jnp.float32)
        params, opt_state, loss, logits = step(params, opt_state, x,
                                               b.adjs, y, w)
        accs.append(float((logits.argmax(-1) == y).mean()))
    assert np.mean(accs[-10:]) > 0.9, np.mean(accs[-10:])


def test_full_graph_adj_inference_matches_sampled_all_neighbors():
    """Sampling with fanout >= max degree must equal full-graph propagation."""
    rng = np.random.default_rng(3)
    topo, feat, labels = _community_graph(rng, n=60)
    model = GraphSAGE(hidden_features=8, out_features=4, num_layers=2,
                      dropout=0.0)
    fadj = full_graph_adj(topo.indptr, topo.indices)
    x = jnp.asarray(feat)
    params = model.init(jax.random.PRNGKey(0), x, (fadj, fadj))
    full_out = np.asarray(model.apply(params, x, (fadj, fadj)))

    sampler = NeighborSampler(topo, [10, 10], mode="TPU", seed=0, dedup="per_hop")  # deg=6<10
    seeds = np.arange(16)
    b = sampler.sample(seeds)
    xb = x[jnp.clip(b.n_id, 0, topo.node_count - 1)]
    out = np.asarray(model.apply(params, xb, b.adjs))[:16]
    np.testing.assert_allclose(out, full_out[:16], rtol=1e-3, atol=1e-4)


def test_fused_train_step_learns():
    """make_sampled_train_step: one-program sample+gather+train must fall
    in loss on the community graph."""
    import optax
    from quiver_tpu.train import make_sampled_train_step

    rng = np.random.default_rng(0)
    topo, feat, labels = _community_graph(rng)
    n = topo.node_count
    sampler = NeighborSampler(topo, [5, 5], mode="TPU", seed=0,
                              dedup="none")
    model = GraphSAGE(hidden_features=32, out_features=4, num_layers=2,
                      dropout=0.0)
    b0 = sampler.sample(np.arange(64))
    x0 = jnp.asarray(feat)[jnp.clip(b0.n_id, 0, n - 1)]
    params = model.init(jax.random.PRNGKey(0), x0, b0.adjs)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = make_sampled_train_step(model, tx, sampler, jnp.asarray(feat),
                                   jnp.asarray(labels))
    key = jax.random.PRNGKey(1)
    losses = []
    for it in range(60):
        key, sub = jax.random.split(key)
        seeds = rng.choice(n, 64, replace=False)
        params, opt_state, loss, logits = step(params, opt_state, seeds, sub)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7


def test_pipelined_train_step_learns():
    """Pipelined variant: same learning signal, one-step-delayed loss."""
    import optax
    from quiver_tpu.train import make_pipelined_train_step

    rng = np.random.default_rng(0)
    topo, feat, labels = _community_graph(rng)
    n = topo.node_count
    sampler = NeighborSampler(topo, [5, 5], mode="TPU", seed=0,
                              dedup="none")
    model = GraphSAGE(hidden_features=32, out_features=4, num_layers=2,
                      dropout=0.0)
    b0 = sampler.sample(np.arange(64))
    x0 = jnp.asarray(feat)[jnp.clip(b0.n_id, 0, n - 1)]
    params = model.init(jax.random.PRNGKey(0), x0, b0.adjs)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    prime, step = make_pipelined_train_step(model, tx, sampler,
                                            jnp.asarray(feat),
                                            jnp.asarray(labels))
    key = jax.random.PRNGKey(1)
    carry = prime(rng.choice(n, 64, replace=False), key)
    losses = []
    for it in range(60):
        key, sub = jax.random.split(key)
        seeds = rng.choice(n, 64, replace=False)
        params, opt_state, loss, carry = step(params, opt_state, carry,
                                              seeds, sub)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7


def test_gcnconv_matches_oracle_full_graph():
    """GCNConv on the full graph vs a numpy oracle of Kipf-Welling
    normalization (self-loop-augmented degrees)."""
    from quiver_tpu.models import GCNConv

    rng = np.random.default_rng(5)
    topo, feat, _ = _community_graph(rng, n=40)
    n = topo.node_count
    fadj = full_graph_adj(topo.indptr, topo.indices)
    # in-degree + self loop (aggregation is over CSR rows' neighbors)
    deg = topo.degree + 1
    layer = GCNConv(8)
    x = jnp.asarray(feat)
    params = layer.init(jax.random.PRNGKey(0), x, fadj, jnp.asarray(deg))
    out = np.asarray(layer.apply(params, x, fadj, jnp.asarray(deg)))

    W = np.asarray(params["params"]["lin"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    xw = feat @ W
    ref = np.zeros_like(xw[:n])
    for v in range(n):
        acc = xw[v] / deg[v]  # self loop: 1/sqrt(dv)/sqrt(dv)
        for sl in range(topo.indptr[v], topo.indptr[v + 1]):
            u = topo.indices[sl]
            acc = acc + xw[u] / (np.sqrt(deg[v]) * np.sqrt(deg[u]))
        ref[v] = acc + b
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_dense_max_aggregation_masked_rows_are_zero():
    """Fully-masked rows (padding / degree-0 dst) must aggregate to 0,
    not finfo.min (ADVICE r1 medium): build a block whose second row has
    no valid lanes and check the output stays finite and small."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from quiver_tpu.models import SAGEConv
    from quiver_tpu.sampling.sampler import DenseBlock

    F, k, D = 2, 3, 4
    mask = jnp.array([[True, True, False], [False, False, False]])
    blk = DenseBlock(mask=mask, e_id=jnp.zeros((F, k), jnp.int32),
                     dst_count=jnp.int32(2), size=(F * (1 + k), F), fanout=k)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(F * (1 + k), D)),
                    jnp.float32)
    layer = SAGEConv(8, aggr="max")
    params = layer.init(jax.random.PRNGKey(0), x, blk)
    out = layer.apply(params, x, blk)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() < 1e3


def test_full_graph_inference_csr_matches_edge_list():
    """GraphSAGE full-graph inference through the Pallas CSRBlock path
    must equal the E-wide edge-list (segment) path."""
    import jax
    import jax.numpy as jnp
    from quiver_tpu.models import GraphSAGE
    from quiver_tpu.models.nets import full_graph_adj
    from quiver_tpu.ops import full_graph_csr

    rng = np.random.default_rng(4)
    V, D = 200, 16
    deg = rng.integers(0, 6, V)
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1]))
    x = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))

    model = GraphSAGE(hidden_features=32, out_features=8, num_layers=2)
    adj_e = full_graph_adj(indptr, indices)
    adj_c = full_graph_csr(indptr, indices)
    params = model.init(jax.random.PRNGKey(0), x, (adj_e, adj_e))
    out_e = model.apply(params, x, (adj_e, adj_e))
    out_c = model.apply(params, x, (adj_c, adj_c))
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_e),
                               rtol=2e-4, atol=2e-4)


def test_full_graph_gat_csr_matches_edge_list():
    """GATConv full-graph inference through the fused Pallas CSRBlock
    path must equal the E-wide edge-list (segment softmax) path."""
    import jax
    import jax.numpy as jnp
    from quiver_tpu.models import GATConv
    from quiver_tpu.models.nets import full_graph_adj
    from quiver_tpu.ops import full_graph_csr

    rng = np.random.default_rng(9)
    V, D = 160, 16
    deg = rng.integers(0, 5, V)
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1]))
    x = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))

    layer = GATConv(8, heads=2)
    adj_e = full_graph_adj(indptr, indices)
    adj_c = full_graph_csr(indptr, indices)
    params = layer.init(jax.random.PRNGKey(0), x, adj_e)
    out_e = layer.apply(params, x, adj_e)
    out_c = layer.apply(params, x, adj_c)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_e),
                               rtol=2e-4, atol=2e-4)


def test_full_graph_gcn_csr_matches_edge_list():
    """GCNConv full-graph inference through the Pallas CSRBlock path
    must equal the edge-list (segment) path."""
    import jax
    import jax.numpy as jnp
    from quiver_tpu.models import GCNConv
    from quiver_tpu.models.nets import full_graph_adj
    from quiver_tpu.ops import full_graph_csr

    rng = np.random.default_rng(10)
    V, D = 150, 8
    deg = rng.integers(0, 5, V)
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1]))
    x = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    degree = jnp.asarray(deg.astype(np.float32) + 1)

    layer = GCNConv(12)
    adj_e = full_graph_adj(indptr, indices)
    adj_c = full_graph_csr(indptr, indices)
    params = layer.init(jax.random.PRNGKey(0), x, adj_e, degree)
    out_e = layer.apply(params, x, adj_e, degree)
    out_c = layer.apply(params, x, adj_c, degree)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_e),
                               rtol=2e-4, atol=2e-4)
