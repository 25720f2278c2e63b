"""Worker process for the real multi-process distribution test.

Launched twice by tests/test_multiprocess.py (2 processes x 2 virtual
CPU devices = a 4-"host" global mesh over Gloo) — the TPU analogue of
the reference's mp.spawn two-procs-per-GPU emulation
(tests/python/cuda/test_comm.py:183-384). Runs the REAL library paths:
init_distributed -> CommWorld.allreduce -> DistFeature.exchange with a
distinct request set per process, ground-truth checked on every rank.
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import quiver_tpu
    from quiver_tpu.comm import init_distributed, CommWorld
    from quiver_tpu.feature import PartitionInfo, DistFeature
    from jax.sharding import Mesh

    init_distributed(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    H = len(jax.devices())
    assert H == 2 * nproc

    # collective sanity through the library wrapper
    world = CommWorld()
    got = np.asarray(world.allreduce(
        np.arange(H, dtype=np.float32).reshape(H, 1)))
    assert np.allclose(got, np.arange(H).sum()), got

    # DistFeature: each global device = one host; every PROCESS issues a
    # distinct request set for each of its local hosts, resolved in one
    # collective pair across process boundaries.
    rng = np.random.default_rng(0)           # same graph on every process
    rows, D = 32, 8
    V = H * rows
    g2h = np.repeat(np.arange(H), rows)[rng.permutation(V)]
    feat = rng.normal(size=(V, D)).astype(np.float32)
    info = PartitionInfo(host=0, hosts=H, global2host=g2h)
    tables = np.zeros((H, rows, D), np.float32)
    for h in range(H):
        ids = np.where(g2h == h)[0]
        tables[h, :len(ids)] = feat[ids]

    mesh = Mesh(np.array(jax.devices()), ("host",))
    dist = DistFeature(mesh, tables, info)
    req_rng = np.random.default_rng(7)       # same trace on every process
    ids_per_host = [req_rng.integers(0, V, 20 + 3 * h) for h in range(H)]
    outs = dist.exchange(ids_per_host)
    local_hosts = [d.id for d in jax.local_devices()]
    checked = 0
    for h in range(H):
        if outs[h] is None:
            assert h not in local_hosts, h
            continue
        np.testing.assert_allclose(np.asarray(outs[h]),
                                   feat[ids_per_host[h]], rtol=1e-6)
        checked += 1
    assert checked == len(local_hosts), (checked, local_hosts)
    print(f"proc {pid}: ok", flush=True)


if __name__ == "__main__":
    main()
