"""Feature store tests — gather vs numpy ground truth (reference
test_shard_tensor.py:44-80, test_features.py:298-344), hot/cold tiering,
mmap disk tier, and the multi-host DistFeature exchange on the virtual
8-device mesh (reference test_comm.py:281-343)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quiver_tpu import CSRTopo
from quiver_tpu.feature import Feature, PartitionInfo, DistFeature
from quiver_tpu.partition import (
    partition_without_replication,
    select_nodes,
    quiver_partition_feature,
    load_quiver_feature_partition,
)


def _graph_and_features(rng, n=500, d=16):
    # Node i has degree proportional to i (node n-1 hottest).
    deg = (rng.pareto(1.5, n) * 3 + 1).astype(np.int64)
    row = np.repeat(np.arange(n), deg)
    col = rng.integers(0, n, row.shape[0])
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=n)
    feat = rng.normal(size=(n, d)).astype(np.float32)
    return topo, feat


def test_feature_gather_ground_truth_no_cache():
    rng = np.random.default_rng(0)
    topo, feat = _graph_and_features(rng)
    f = Feature(device_cache_size=0).from_cpu_tensor(feat)
    ids = rng.integers(0, 500, 200)
    out = np.asarray(f[ids])
    np.testing.assert_array_equal(out, feat[ids])
    assert f.stats["hot_hits"] == 0 and f.stats["cold_hits"] == 200


def test_feature_gather_ground_truth_with_cache_and_reorder():
    rng = np.random.default_rng(1)
    topo, feat = _graph_and_features(rng)
    budget = 100 * feat.itemsize * feat.shape[1]  # 100 hot rows
    f = Feature(device_cache_size=budget, csr_topo=topo)
    f.from_cpu_tensor(feat.copy())
    ids = rng.integers(0, 500, 300)
    out = np.asarray(f[ids])
    np.testing.assert_allclose(out, feat[ids], rtol=1e-6)
    assert f.hot_rows == 100
    # the 100 hottest (highest-degree) nodes must be hot-tier hits
    hot_nodes = np.argsort(-topo.degree, kind="stable")[:100]
    f2 = Feature(device_cache_size=budget, csr_topo=topo)
    f2.from_cpu_tensor(feat.copy())
    _ = f2[hot_nodes]
    assert f2.stats["cold_hits"] == 0
    assert f2.cache_hit_rate() == 1.0


def test_feature_full_cache():
    rng = np.random.default_rng(2)
    topo, feat = _graph_and_features(rng, n=100)
    f = Feature(device_cache_size="1G").from_cpu_tensor(feat)
    assert f.hot_rows == 100
    ids = np.arange(100)
    np.testing.assert_array_equal(np.asarray(f[ids]), feat)
    assert f.stats["cold_hits"] == 0


def test_feature_mmap_disk_tier(tmp_path):
    rng = np.random.default_rng(3)
    topo, feat = _graph_and_features(rng, n=120)
    disk_feat = rng.normal(size=(30, 16)).astype(np.float32)
    p = tmp_path / "disk.npy"
    np.save(p, disk_feat)
    f = Feature(device_cache_size="1G").from_cpu_tensor(feat)
    disk_map = np.full(120, -1, np.int64)
    disk_ids = np.arange(60, 90)
    disk_map[disk_ids] = np.arange(30)
    f.set_mmap_file(str(p), disk_map)
    ids = np.arange(50, 100)
    out = np.asarray(f[ids])
    expect = feat[ids].copy()
    on_disk = (ids >= 60) & (ids < 90)
    expect[on_disk] = disk_feat[ids[on_disk] - 60]
    np.testing.assert_array_equal(out, expect)
    assert f.stats["disk_hits"] == int(on_disk.sum())


def test_partition_quality_and_balance():
    """Partition quality CDF: each host's own-probability mass over its
    partition should beat a random split (reference test_partition.py)."""
    rng = np.random.default_rng(4)
    V, H = 2000, 4
    probs = []
    for h in range(H):
        p = np.zeros(V)
        hot = rng.choice(V, 400, replace=False)
        p[hot] = rng.random(400)
        probs.append(p)
    parts = partition_without_replication(probs)
    sizes = np.array([len(x) for x in parts])
    accessed = select_nodes(probs)
    assert sizes.sum() == len(accessed)
    assert sizes.max() - sizes.min() <= 2 * 256 + H  # chunk-balanced
    own = sum(probs[h][parts[h]].sum() for h in range(H))
    rand_split = np.array_split(rng.permutation(accessed), H)
    rnd = sum(probs[h][rand_split[h]].sum() for h in range(H))
    assert own > rnd * 1.2  # clearly better than random


def test_partition_artifacts_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    V, H = 300, 2
    probs = [rng.random(V) * (rng.random(V) > 0.3) for _ in range(H)]
    parts, book, orders = quiver_partition_feature(
        probs, str(tmp_path), cache_memory_budget="1K",
        per_feature_size=64)
    book2, ids2, order2 = load_quiver_feature_partition(str(tmp_path), 0)
    np.testing.assert_array_equal(book, book2)
    np.testing.assert_array_equal(parts[0], ids2)
    assert len(order2) == min(len(parts[0]), (1 << 10) // 64)
    # book consistency
    for h in range(H):
        assert np.all(book[parts[h]] == h)


def test_dist_feature_exchange_mesh():
    """DistFeature all-to-all gather over the 8-device virtual mesh must
    equal a host-side gather (reference test_comm.py child_feat_partition)."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(6)
    H, rows, D, V = 8, 64, 8, 8 * 64
    devices = np.array(jax.devices()[:H])
    mesh = Mesh(devices, ("host",))

    global2host = np.repeat(np.arange(H), rows)
    perm = rng.permutation(V)
    global2host = global2host[perm]
    feat = rng.normal(size=(V, D)).astype(np.float32)

    info = PartitionInfo(host=0, hosts=H, global2host=global2host)
    tables = np.zeros((H, rows, D), np.float32)
    for h in range(H):
        ids = np.where(global2host == h)[0]
        tables[h, :len(ids)] = feat[ids]

    dist = DistFeature(mesh, tables, info)
    ids = rng.integers(0, V, 100)
    out = np.asarray(dist[ids])
    np.testing.assert_allclose(out, feat[ids], rtol=1e-6)


def test_feature_p2p_clique_sharded_policy():
    """p2p_clique_replicate: hot rows sharded across the mesh; gather
    must still match ground truth (the NVLink-clique analogue)."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(7)
    topo, feat = _graph_and_features(rng, n=256, d=8)
    mesh = Mesh(np.array(jax.devices()[:8]), ("cache",))
    budget = 16 * feat.itemsize * feat.shape[1]  # 16 rows/device * 8 = 128
    f = Feature(device_cache_size=budget, cache_policy="p2p_clique_replicate",
                csr_topo=topo, mesh=mesh)
    f.from_cpu_tensor(feat.copy())
    assert f.hot_rows == 128
    ids = rng.integers(0, 256, 200)
    np.testing.assert_allclose(np.asarray(f[ids]), feat[ids], rtol=1e-6)
    # hot tier really is sharded over the mesh
    shardings = {str(s.device) for s in f.hot.addressable_shards}
    assert len(shardings) == 8
    # the lookup runs the explicit owner-gather (masked local take +
    # ONE psum of the [m, D] result), NOT an XLA-chosen all-gather of
    # the full hot table: the compiled program's collective operands
    # must be result-sized, never hot-table-sized (r4 weak #5)
    from quiver_tpu.feature import _make_sharded_gather
    g = _make_sharded_gather(mesh, "cache")
    pos = jnp.arange(64, dtype=jnp.int32)
    txt = g.lower(f.hot, pos).compile().as_text()
    import re
    coll_lines = [ln for ln in txt.splitlines()
                  if "all-gather" in ln or "all-reduce" in ln]
    assert coll_lines, "expected a collective in the owner-gather"
    for ln in coll_lines:
        shp = re.search(r"f32\[([0-9,]*)\]", ln)
        assert shp is not None, f"collective without an f32 shape: {ln}"
        dims = [int(x) for x in shp.group(1).split(",") if x]
        assert np.prod(dims, initial=1) <= 64 * feat.shape[1], ln
    np.testing.assert_allclose(np.asarray(g(f.hot, pos)),
                               np.asarray(jax.device_get(f.hot))[:64],
                               rtol=1e-6)


def test_feature_access_prob_placement():
    """Probability-ordered placement: the highest-prob nodes land in the
    hot tier regardless of degree (reference cache_order semantics)."""
    rng = np.random.default_rng(8)
    topo, feat = _graph_and_features(rng, n=200, d=4)
    prob = rng.random(200)
    hot_set = np.argsort(-prob)[:50]
    budget = 50 * feat.itemsize * 4
    f = Feature(device_cache_size=budget)
    f.from_cpu_tensor(feat.copy(), access_prob=prob)
    np.testing.assert_allclose(np.asarray(f[np.arange(200)]), feat,
                               rtol=1e-6)
    f2 = Feature(device_cache_size=budget)
    f2.from_cpu_tensor(feat.copy(), access_prob=prob)
    _ = f2[hot_set]
    assert f2.stats["cold_hits"] == 0


def test_partition_info_replicate_resolves_local():
    """Replicated ids resolve to the local host with appended local slots
    (reference PartitionInfo replicate handling, feature.py:461-526)."""
    V, H = 40, 4
    g2h = np.arange(V) % H
    rep = np.array([1, 2, 3])  # ids owned by hosts 1..3, replicated on 0
    info = PartitionInfo(host=0, hosts=H, global2host=g2h, replicate=rep)
    ids = np.array([0, 1, 2, 3, 4, 5])
    by_host, orders = info.dispatch(ids)
    # 0, 4 owned by host 0; 1,2,3 replicated -> host 0; 5 -> host 1
    assert sorted(by_host[0].tolist()) == [0, 1, 2, 3, 4]
    assert by_host[1].tolist() == [5]
    # replicated rows sit after the host's own rows
    own = (g2h == 0).sum()
    assert info.global2local[1] == own + 0
    assert info.global2local[3] == own + 2


def test_from_mmap_keeps_disk_tier(tmp_path):
    """from_mmap must NOT materialize the table in RAM: the cold tier
    stays a memmap view and lookups read through it (ADVICE r1)."""
    import numpy as np
    from quiver_tpu import Feature

    V, D = 64, 8
    arr = np.arange(V * D, dtype=np.float32).reshape(V, D)
    path = tmp_path / "feat.npy"
    np.save(path, arr)
    f = Feature.from_mmap(str(path), device_cache_size=16 * D * 4)
    assert f.hot_rows == 16
    assert isinstance(f.cold, np.memmap)
    ids = np.array([0, 3, 15, 16, 40, 63])
    np.testing.assert_array_equal(np.asarray(f[ids]), arr[ids])


def test_dist_feature_concurrent_exchange():
    """Every host resolves its OWN distinct id set in ONE collective pair
    (reference NcclComm.exchange comm.py:127-182): 8 distinct request
    sets, ground-truth checked, and the padded wire width stays within
    2x of the largest per-pair request count (received rows ~ requested
    rows, not H x them)."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(16)
    H, rows, D, V = 8, 64, 8, 8 * 64
    mesh = Mesh(np.array(jax.devices()[:H]), ("host",))

    global2host = np.repeat(np.arange(H), rows)[rng.permutation(V)]
    feat = rng.normal(size=(V, D)).astype(np.float32)
    info = PartitionInfo(host=0, hosts=H, global2host=global2host)
    tables = np.zeros((H, rows, D), np.float32)
    for h in range(H):
        ids = np.where(global2host == h)[0]
        tables[h, :len(ids)] = feat[ids]

    dist = DistFeature(mesh, tables, info)
    ids_per_host = [rng.integers(0, V, 40 + 5 * h) for h in range(H)]
    outs = dist.exchange(ids_per_host)
    for h in range(H):
        np.testing.assert_allclose(np.asarray(outs[h]),
                                   feat[ids_per_host[h]], rtol=1e-6,
                                   err_msg=f"host {h}")

    # wire-width accounting: the padded pairwise cap is a power-of-two
    # bucket of the max per-pair count — within 2x of information need
    max_pair = max(
        int(np.max(np.bincount(info.owner[np.asarray(ids)], minlength=H)))
        for ids in ids_per_host)
    cap = 1 << (max_pair - 1).bit_length()
    assert cap <= 2 * max_pair


def test_dist_feature_exchange_with_replicate():
    """Replicated hot rows resolve from the requester's OWN shard (no
    cross-host traffic), via per-host PartitionInfos (reference
    PartitionInfo.replicate feature.py:461-508)."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(17)
    H, rows, D = 8, 32, 4
    V = H * rows
    mesh = Mesh(np.array(jax.devices()[:H]), ("host",))

    global2host = np.repeat(np.arange(H), rows)
    feat = rng.normal(size=(V, D)).astype(np.float32)
    # every host replicates the first 4 rows of host 0's shard
    rep = np.arange(4)
    n_rep = len(rep)

    infos, shards = [], []
    for h in range(H):
        infos.append(PartitionInfo(host=h, hosts=H,
                                   global2host=global2host, replicate=rep))
        own = np.where(global2host == h)[0]
        shards.append(np.concatenate([feat[own], feat[rep]]))
    pad = max(s.shape[0] for s in shards)
    tables = np.zeros((H, pad, D), np.float32)
    for h in range(H):
        tables[h, :shards[h].shape[0]] = shards[h]

    dist = DistFeature(mesh, tables, infos[0])
    ids_per_host = [np.concatenate([rep, rng.integers(0, V, 20)])
                    for _ in range(H)]
    outs = dist.exchange(ids_per_host, infos=infos)
    for h in range(H):
        np.testing.assert_allclose(np.asarray(outs[h]),
                                   feat[ids_per_host[h]], rtol=1e-6,
                                   err_msg=f"host {h}")


def test_cold_transfer_dtype_halves_bytes_keeps_values():
    """cold_transfer_dtype=float16 narrows only the H2D hop of miss
    rows (reference stores fp16 ShardTensors, quiver_feature.cu:263-267);
    values come back within half-precision tolerance, hits stay exact."""
    import numpy as np
    from quiver_tpu import Feature

    rng = np.random.default_rng(0)
    V, D = 1000, 16
    table = rng.normal(size=(V, D)).astype(np.float32)
    budget = 300 * D * 4
    f = Feature(device_cache_size=budget, cold_transfer_dtype=np.float16)
    f.from_cpu_tensor(table.copy())

    ids = rng.integers(0, V, 256)
    got = np.asarray(f[ids])
    want = table[ids]
    hot_mask = ids < f.hot_rows   # no reorder: positions == ids
    np.testing.assert_array_equal(got[hot_mask], want[hot_mask])
    np.testing.assert_allclose(got[~hot_mask], want[~hot_mask],
                               rtol=2e-3, atol=2e-3)
    assert got.dtype == np.float32


def test_prefetch_matches_direct_lookup():
    import numpy as np
    from quiver_tpu import Feature

    rng = np.random.default_rng(1)
    V, D = 500, 8
    table = rng.normal(size=(V, D)).astype(np.float32)
    f = Feature(device_cache_size=100 * D * 4)
    f.from_cpu_tensor(table.copy())
    ids = rng.integers(0, V, 64)
    f.prefetch(ids)
    got = np.asarray(f[ids])
    np.testing.assert_array_equal(got, table[ids])
    # mismatched prefetch falls through to a correct direct lookup
    f.prefetch(rng.integers(0, V, 64))
    other = rng.integers(0, V, 32)
    np.testing.assert_array_equal(np.asarray(f[other]), table[other])


def test_lookup_routes_sentinel_padding_to_hot_row():
    """Samplers pad n_id with SENTINEL (and dispatch masks with -1);
    a reordered Feature (access_prob set) must not index feature_order
    with those out-of-range ids (round-2 review finding)."""
    import numpy as np
    from quiver_tpu import Feature
    from quiver_tpu.sampling.sampler import SENTINEL

    rng = np.random.default_rng(2)
    V, D = 300, 6
    table = rng.normal(size=(V, D)).astype(np.float32)
    w = rng.pareto(1.5, V) + 1.0
    f = Feature(device_cache_size=50 * D * 4)
    f.from_cpu_tensor(table.copy(), access_prob=w)

    valid = rng.integers(0, V, 40)
    ids = np.concatenate([valid, np.full(24, int(SENTINEL), np.int64),
                          np.full(8, -1, np.int64)])
    before_cold = f.stats["cold_hits"]
    got = np.asarray(f[ids])
    np.testing.assert_allclose(got[:40], table[valid], rtol=1e-6)
    # padding resolves to row 0 (hot) — no host traffic for pad rows
    np.testing.assert_allclose(got[40:], np.broadcast_to(table[0], (32, D)),
                               rtol=1e-6)
    assert f.stats["cold_hits"] - before_cold <= 40


def test_prefetch_mismatch_drains_before_foreground_lookup():
    """A discarded prefetch must be retired (not left running) so the
    background _lookup can't race the foreground one on stats."""
    import numpy as np
    from quiver_tpu import Feature

    rng = np.random.default_rng(3)
    V, D = 400, 4
    table = rng.normal(size=(V, D)).astype(np.float32)
    f = Feature(device_cache_size=100 * D * 4)
    f.from_cpu_tensor(table.copy())
    f[rng.integers(0, V, 16)]  # warm
    f.stats = {k: 0 for k in f.stats}

    a = rng.integers(0, V, 64)
    b = rng.integers(0, V, 64)
    f.prefetch(a)
    f.prefetch(b)            # first prefetch retired here
    got = np.asarray(f[rng.integers(0, V, 32)])  # mismatch: b retired too
    # a prefetch retired BEFORE it started counts nothing; one retired
    # after starting is drained to completion — either way the counters
    # are consistent (no torn increments from a still-running thread)
    assert f.stats["lookups"] >= 32
    assert f.stats["lookups"] % 32 == 0
    assert f.stats["hot_hits"] + f.stats["cold_hits"] == f.stats["lookups"]
