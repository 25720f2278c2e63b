"""Fused / tiered training-step tests (quiver_tpu.train)."""
def test_feature_train_step_tiered_table_loss_decreases():
    """make_feature_train_step trains through a tiered Feature whose hot
    budget holds only part of the table (cold rows from host RAM) — the
    >HBM-table capability (reference pinned-CPU ShardTensor shards)."""
    import numpy as np
    import jax
    import optax
    from quiver_tpu import CSRTopo, NeighborSampler, Feature
    from quiver_tpu.models import GraphSAGE
    from quiver_tpu.train import make_feature_train_step

    rng = np.random.default_rng(0)
    n, d, classes = 600, 16, 4
    labels = rng.integers(0, classes, n)
    # structure-correlated features so the loss can fall
    feat = (np.eye(classes, dtype=np.float32)[labels]
            .repeat(d // classes, axis=1))
    feat += rng.normal(scale=0.3, size=feat.shape).astype(np.float32)
    row = rng.integers(0, n, 6000)
    col = rng.integers(0, n, 6000)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=n)

    store = Feature(device_cache_size=150 * d * 4)  # 25% of rows hot
    store.from_cpu_tensor(feat.copy())
    assert 0 < store.hot_rows < n

    sampler = NeighborSampler(topo, [5, 3], mode="TPU", seed=0,
                              dedup="per_hop")
    model = GraphSAGE(hidden_features=32, out_features=classes,
                      num_layers=2)
    b0 = sampler.sample(np.arange(32))
    x0 = store[np.asarray(b0.n_id)]
    params = model.init(jax.random.PRNGKey(0), x0, b0.adjs)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    step = make_feature_train_step(model, tx, sampler, store, labels)
    losses = []
    for i in range(8):
        seeds = rng.integers(0, n, 64)
        params, opt, loss, _ = step(params, opt, seeds)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0]
    assert store.stats["cold_hits"] > 0   # the cold tier was exercised
