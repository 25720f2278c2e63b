"""On-chip compiled-kernel correctness tier.

Runs every Pallas kernel family with ``interpret=False`` on the REAL
TPU and checks output equality against independent (numpy) oracles —
the hardware analogue of the reference's self-hosted GPU test workflow
(reference: .github/workflows/gpu.yaml). The CPU test suite verifies
the same kernels in interpret mode only; a wrong DMA offset or layout
assumption that only manifests in compiled Mosaic would pass there and
silently corrupt training — this tier exists to catch exactly that.

Emits TPU_TESTS.json: one record per check with status / max abs error /
wall seconds. Exit code 1 if any check fails.

Run: ``python tools/tpu_correctness.py`` (on the TPU host; first run
compiles ~5-10 min over the tunnel, later runs hit the persistent
compilation cache).
"""
from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import quiver_tpu

RESULTS = []
CHECKS = []


def check(name):
    def deco(fn):
        def run():
            t0 = time.time()
            rec = {"test": name}
            try:
                err = fn()
                rec["status"] = "pass"
                if err is not None:
                    rec["max_abs_err"] = float(err)
            except Exception as e:
                rec["status"] = "fail"
                rec["error"] = f"{type(e).__name__}: {e}"
                traceback.print_exc()
            rec["seconds"] = round(time.time() - t0, 1)
            print(f"{rec['status'].upper():4s} {name} "
                  f"({rec['seconds']}s"
                  + (f", err={rec.get('max_abs_err'):.2e}"
                     if "max_abs_err" in rec else "") + ")",
                  flush=True)
            RESULTS.append(rec)
        run.__name__ = name
        CHECKS.append(run)
        return run
    return deco


def _maxerr(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return np.abs(got - want).max()


# ---------------------------------------------------------------------------
# Lane-streaming aggregation kernel (ops/lane_kernels.py) — the training
# hot loop's compiled custom VJP.


def _lane_oracle(x, maskf, aggr):
    k, F = maskf.shape
    lanes = np.asarray(x, np.float64)[F:F + F * k].reshape(k, F, -1)
    m = np.asarray(maskf, bool).reshape(k, F)[..., None]
    if aggr == "max":
        out = np.where(m, lanes, -np.inf).max(0)
        return np.where(np.isfinite(out), out, 0.0)
    acc = (lanes * m).sum(0)
    if aggr == "mean":
        acc = acc / np.maximum(m.sum(0), 1)
    return acc


def _lane_bwd_oracle(g, maskf, mean):
    k, F = maskf.shape
    g = np.asarray(g, np.float64)
    m = np.asarray(maskf, bool)                    # [k, F]
    D = g.shape[1]
    dx = np.zeros((F * (1 + k), D))
    deg = np.maximum(m.sum(0), 1)                  # [F]
    for j in range(k):
        rows = g * m[j][:, None]
        if mean:
            rows = rows / deg[:, None]
        dx[F + j * F:F + (j + 1) * F] = rows
    return dx


@check("lane_fwd_compiled_f32")
def _():
    from quiver_tpu.ops import lane_kernels as lk
    rng = np.random.default_rng(4)
    F, k, D = 520, 5, 128
    x = jnp.asarray(rng.normal(size=(F * (1 + k), D)).astype(np.float32))
    maskf = jnp.asarray((rng.random((k, F)) < 0.8).astype(np.float32))
    worst = 0.0
    for aggr in ("mean", "sum", "max"):
        got = lk._fwd_pallas(x, maskf, f=F, k=k, tile=256, aggr=aggr,
                             interpret=False)
        want = _lane_oracle(x, maskf, aggr)
        err = _maxerr(got, want)
        worst = max(worst, err)
        assert err < 1e-4, (aggr, err)
    return worst


@check("lane_fwd_compiled_bf16_tail")
def _():
    # non-TILE-aligned tail path + bf16 accumulate semantics
    from quiver_tpu.ops import lane_kernels as lk
    rng = np.random.default_rng(5)
    F, k, D = 512 + 48, 3, 128
    x32 = rng.normal(size=(F * (1 + k), D)).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    maskf = jnp.asarray((rng.random((k, F)) < 0.8).astype(np.float32))
    worst = 0.0
    for aggr in ("mean", "sum"):
        got = np.asarray(lk._fwd_pallas(x, maskf, f=F, k=k, tile=256,
                                        aggr=aggr, interpret=False),
                         np.float32)
        want = _lane_oracle(np.asarray(x, np.float32), maskf, aggr)
        err = _maxerr(got, want)
        worst = max(worst, err)
        assert err < 0.15, (aggr, err)     # bf16 output quantization
    return worst


@check("lane_bwd_compiled")
def _():
    from quiver_tpu.ops import lane_kernels as lk
    rng = np.random.default_rng(6)
    F, k, D = 520, 5, 128
    g = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32))
    maskf = jnp.asarray((rng.random((k, F)) < 0.8).astype(np.float32))
    worst = 0.0
    for mean in (True, False):
        got = lk._bwd_pallas(g, maskf, f=F, k=k, tile=256, mean=mean,
                             interpret=False, dtype=jnp.float32)
        want = _lane_bwd_oracle(g, maskf, mean)
        err = _maxerr(got, want)
        worst = max(worst, err)
        assert err < 1e-5, (mean, err)
    return worst


@check("lane_grad_e2e_compiled")
def _():
    # jax.grad through the public API: the dispatcher must pick the
    # compiled kernel on this backend (asserted), and the custom-VJP
    # gradient must match the analytic formula.
    from quiver_tpu.ops import lane_aggregate
    from quiver_tpu.ops import lane_kernels as lk
    rng = np.random.default_rng(7)
    F, k, D = 2048, 4, 128
    x = jnp.asarray(rng.normal(size=(F * (1 + k), D)).astype(np.float32))
    mask = (rng.random((F, k)) < 0.8)
    assert lk._use_pallas(x, F, k, D), "dispatcher took the XLA path"
    maskf = jnp.asarray(mask.T.astype(np.float32))
    worst = 0.0
    for aggr in ("mean", "sum"):
        got = jax.grad(
            lambda xv: (lane_aggregate(xv, jnp.asarray(mask), aggr)
                        .astype(jnp.float32) ** 2).sum())(x)
        out = _lane_oracle(x, maskf, aggr)
        want = _lane_bwd_oracle(2.0 * out, maskf, aggr == "mean")
        err = _maxerr(got, want)
        worst = max(worst, err)
        assert err < 1e-2, (aggr, err)
    return worst


@check("lane_rel_compiled")
def _():
    # typed-relation kernel: compiled fwd [F, R, D] + custom-VJP grad
    # vs numpy oracles
    from quiver_tpu.ops import lane_kernels as lk
    rng = np.random.default_rng(31)
    F, k, D, R = 520, 5, 128, 3
    x32 = rng.normal(size=(F * (1 + k), D)).astype(np.float32)
    x = jnp.asarray(x32)
    mask = rng.random((k, F)) < 0.8
    rel = rng.integers(0, R, (k, F))
    relf = jnp.asarray(np.where(mask, rel, -1).astype(np.float32))
    worst = 0.0
    for mean in (True, False):
        got = np.asarray(lk._fwd_rel_pallas(x, relf, f=F, k=k, tile=256,
                                            R=R, mean=mean,
                                            interpret=False))
        lanes = x32[F:].reshape(k, F, D).astype(np.float64)
        want = np.zeros((F, R, D))
        for r in range(R):
            mr = (np.where(mask, rel, -1) == r)
            s = (lanes * mr[..., None]).sum(0)
            if mean:
                s = s / np.maximum(mr.sum(0), 1)[:, None]
            want[:, r] = s
        err = _maxerr(got, want)
        worst = max(worst, err)
        assert err < 1e-4, (mean, err)
        g = rng.normal(size=(F, R, D)).astype(np.float32)
        gotb = np.asarray(lk._bwd_rel_pallas(
            jnp.asarray(g), relf, f=F, k=k, tile=256, R=R, mean=mean,
            interpret=False, dtype=jnp.float32))
        wantb = np.zeros((F * (1 + k), D))
        gg = g.astype(np.float64)
        if mean:
            cnt = np.stack([(np.where(mask, rel, -1) == r).sum(0)
                            for r in range(R)], 1)       # [F, R]
            gg = gg / np.maximum(cnt, 1)[..., None]
        for j in range(k):
            for r in range(R):
                sel = np.where(mask[j] & (rel[j] == r))[0]
                wantb[F + j * F + sel] = gg[sel, r]
        err = _maxerr(gotb, wantb)
        worst = max(worst, err)
        assert err < 1e-5, (mean, err)
    return worst


# ---------------------------------------------------------------------------
# Flash-GAT lane kernel (ops/gat_kernels.py)


def _gat_oracle(x, asr, adr, maskf, h, slope):
    x = np.asarray(x, np.float64)
    asr = np.asarray(asr, np.float64).reshape(-1)
    adr = np.asarray(adr, np.float64).reshape(-1)
    k, F = maskf.shape
    hc = x.shape[1]
    C = hc // h
    m = np.asarray(maskf, bool)                    # [k, F]
    xh = x.reshape(-1, h, C)
    a_s = (xh * asr.reshape(h, C)[None]).sum(-1)   # [N, h]
    a_d = (xh * adr.reshape(h, C)[None]).sum(-1)
    out = np.zeros((F, h, C))
    for i in range(F):
        lanes = [F + j * F + i for j in range(k) if m[j, i]]
        if not lanes:
            continue
        e = a_s[lanes] + a_d[i][None]              # [d, h]
        e = np.where(e >= 0, e, slope * e)
        e = e - e.max(0, keepdims=True)
        w = np.exp(e)
        w = w / w.sum(0, keepdims=True)
        out[i] = (xh[lanes] * w[..., None]).sum(0)
    return out.reshape(F, hc)


@check("flash_gat_fwd_compiled")
def _():
    from quiver_tpu.ops.gat_kernels import flash_gat_lane, _use_pallas
    rng = np.random.default_rng(8)
    F, k, H, C = 512, 5, 4, 32
    x = jnp.asarray(rng.normal(size=(F * (1 + k), H * C))
                    .astype(np.float32))
    assert _use_pallas(x, F, k, H * C), "dispatcher took the XLA path"
    mask = rng.random((F, k)) < 0.8
    mask[:3] = False                               # empty neighborhoods
    asr = rng.normal(size=(1, H * C)).astype(np.float32) * 0.3
    adr = rng.normal(size=(1, H * C)).astype(np.float32) * 0.3
    got = flash_gat_lane(x, jnp.asarray(asr), jnp.asarray(adr),
                         jnp.asarray(mask), H)
    want = _gat_oracle(x, asr, adr, mask.T, H, 0.2)
    err = _maxerr(got, want)
    assert err < 1e-3, err
    return err


@check("flash_gat_grad_compiled")
def _():
    # custom-VJP grads (x AND both attention vectors) vs autodiff of an
    # independent jnp formula of the same math
    from quiver_tpu.ops.gat_kernels import flash_gat_lane, _use_pallas
    rng = np.random.default_rng(9)
    F, k, H, C = 512, 4, 4, 32
    hc = H * C
    x = jnp.asarray(rng.normal(size=(F * (1 + k), hc)).astype(np.float32))
    assert _use_pallas(x, F, k, hc), "dispatcher took the XLA path"
    mask = rng.random((F, k)) < 0.8
    maskj = jnp.asarray(mask)
    asr = jnp.asarray(rng.normal(size=(1, hc)).astype(np.float32) * 0.3)
    adr = jnp.asarray(rng.normal(size=(1, hc)).astype(np.float32) * 0.3)

    def ref(xv, a_s, a_d):
        xh = xv.reshape(-1, H, C)
        ls = (xh * a_s.reshape(H, C)[None]).sum(-1)
        ld = (xh * a_d.reshape(H, C)[None]).sum(-1)
        lanes = xh[F:].reshape(k, F, H, C)
        e = ls[F:].reshape(k, F, H) + ld[:F][None]
        e = jnp.where(e >= 0, e, 0.2 * e)
        mf = maskj.T[..., None]
        e = jnp.where(mf, e, -jnp.inf)
        e = e - jax.lax.stop_gradient(
            jnp.max(jnp.where(mf, e, -1e30), axis=0, keepdims=True))
        w = jnp.where(mf, jnp.exp(e), 0.0)
        den = jnp.maximum(w.sum(0), 1e-30)
        alpha = w / den[None]
        return (lanes * alpha[..., None]).sum(0).reshape(F, hc)

    def loss(fn):
        return lambda xv, a_s, a_d: (fn(xv, a_s, a_d) ** 2).sum()

    g_got = jax.grad(loss(lambda xv, a_s, a_d: flash_gat_lane(
        xv, a_s, a_d, maskj, H)), argnums=(0, 1, 2))(x, asr, adr)
    g_ref = jax.grad(loss(ref), argnums=(0, 1, 2))(x, asr, adr)
    worst = 0.0
    for a, b, nm in zip(g_got, g_ref, ("dx", "dasr", "dadr")):
        scale = max(1.0, float(jnp.abs(b).max()))
        err = _maxerr(a, b) / scale
        worst = max(worst, err)
        assert err < 5e-3, (nm, err)
    return worst


# ---------------------------------------------------------------------------
# Fused Pallas block sampler (sampling/pallas_sampler.py)


@check("fused_sampler_contract_compiled")
def _():
    from quiver_tpu.sampling.kernels import build_block_layout
    from quiver_tpu.sampling.pallas_sampler import (
        sample_adjacency_block_fused)
    rng = np.random.default_rng(0)
    V, k = 500, 5
    deg = np.maximum(rng.pareto(1.2, V).astype(np.int64), 1)
    deg[::50] = 200
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1])).astype(np.int32)
    N = 256
    frontier = rng.integers(0, V, N).astype(np.int32)
    fv = rng.random(N) < 0.9
    # W=128: the compiled Pallas kernel (Mosaic needs 128-aligned
    # slices); W=32: the byte-budget fallback width, which must route
    # to the staged block-exact path on hardware (the r4 fix this tier
    # caught: Mosaic rejected the 32-lane slice that interpret allowed)
    for W in (128, 32):
        blk = jnp.asarray(build_block_layout(indptr, indices, W))
        nbr, mask, slot = sample_adjacency_block_fused(
            blk, jnp.asarray(indices), jnp.asarray(frontier),
            jnp.asarray(fv), k, jax.random.PRNGKey(3), big_cap=64,
            interpret=False)
        nbr, mask, slot = map(np.asarray, (nbr, mask, slot))
        for i in range(N):
            d = int(indptr[frontier[i] + 1] - indptr[frontier[i]]) \
                if fv[i] else 0
            got = int(mask[i].sum())
            assert got in (min(d, k), 0), (W, i, got, d)
            if got:
                s0 = int(indptr[frontier[i]])
                s1 = int(indptr[frontier[i] + 1])
                sl = slot[i][mask[i]]
                assert (sl >= s0).all() and (sl < s1).all(), (W, i)
                assert len(set(sl.tolist())) == len(sl), (W, i)
                assert (nbr[i][mask[i]] == indices[sl]).all(), (W, i)
    return None


@check("fused_sampler_uniform_compiled")
def _():
    from quiver_tpu.sampling.kernels import build_block_layout
    from quiver_tpu.sampling.pallas_sampler import (
        sample_adjacency_block_fused)
    d, W, k, T = 20, 128, 5, 4000
    ip = np.array([0, d], np.int64)
    ind = np.arange(d, dtype=np.int32)
    blk = jnp.asarray(build_block_layout(ip, ind, W))
    nb, mk, _ = sample_adjacency_block_fused(
        blk, jnp.asarray(ind), jnp.zeros(T, jnp.int32),
        jnp.ones(T, bool), k, jax.random.PRNGKey(7), big_cap=T,
        interpret=False)
    hits = np.bincount(np.asarray(nb)[np.asarray(mk)], minlength=d)
    expect = T * k / d
    chi2 = ((hits - expect) ** 2 / expect).sum()
    assert chi2 < d - 1 + 4 * np.sqrt(2 * (d - 1)), chi2
    return None


@check("fused_sampler_compiled_equals_interpret")
def _():
    # the kernel consumes pre-drawn uniforms, so compiled and interpret
    # runs are DETERMINISTIC on the same key: outputs must be equal
    # exactly (a wrong DMA offset or layout assumption in compiled
    # Mosaic shows up as a value diff here even if both are "valid")
    from quiver_tpu.sampling.kernels import build_block_layout
    from quiver_tpu.sampling.pallas_sampler import sample_block_fused
    rng = np.random.default_rng(12)
    V, W, k, N = 400, 128, 5, 512
    deg = np.maximum(rng.pareto(1.2, V).astype(np.int64), 1)
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1])).astype(np.int32)
    blk = jnp.asarray(build_block_layout(indptr, indices, W))
    frontier = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    fv = jnp.asarray(rng.random(N) < 0.9)
    key = jax.random.PRNGKey(5)
    outs_c = sample_block_fused(blk, frontier, fv, key, k=k,
                                interpret=False)
    outs_i = sample_block_fused(blk, frontier, fv, key, k=k,
                                interpret=True)
    for a, b, nm in zip(outs_c, outs_i,
                        ("nbr", "mask", "slot", "start", "deg")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)
    return 0.0


@check("flash_gat_fwd_compiled_bf16")
def _():
    from quiver_tpu.ops.gat_kernels import flash_gat_lane, _use_pallas
    rng = np.random.default_rng(14)
    F, k, H, C = 512, 5, 4, 32
    x32 = rng.normal(size=(F * (1 + k), H * C)).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    assert _use_pallas(x, F, k, H * C), "dispatcher took the XLA path"
    mask = rng.random((F, k)) < 0.8
    asr = rng.normal(size=(1, H * C)).astype(np.float32) * 0.3
    adr = rng.normal(size=(1, H * C)).astype(np.float32) * 0.3
    got = np.asarray(flash_gat_lane(x, jnp.asarray(asr), jnp.asarray(adr),
                                    jnp.asarray(mask), H), np.float32)
    want = _gat_oracle(np.asarray(x, np.float32), asr, adr, mask.T, H, 0.2)
    err = _maxerr(got, want)
    # bf16 products + quantized inputs: LeakyReLU-kink / near-tie slack
    assert err < 0.08, err
    return err


# ---------------------------------------------------------------------------
# Fused dedup scan (ops/scan_kernels.py)


@check("dedup_scan_compiled")
def _():
    from quiver_tpu.ops.scan_kernels import (fused_dedup_postprocess,
                                             _use_compiled)
    from quiver_tpu.ops.unique import SENTINEL
    assert _use_compiled(), "scan would run the XLA fallback here"
    rng = np.random.default_rng(3)
    B, M = 1024, 40000
    T = B + M
    cap = 18000
    ids = rng.integers(0, 12000, T).astype(np.int32)
    ids = np.where(rng.random(T) > 0.15, ids, SENTINEL)
    pos = np.arange(T, dtype=np.int32)
    o = np.lexsort((pos, ids))
    s, order = ids[o], pos[o].astype(np.int32)
    bc = 800

    src, emask, newkey, n_new = fused_dedup_postprocess(
        jnp.asarray(s), jnp.asarray(order), jnp.int32(bc), B=B,
        capacity=cap)
    src, emask, newkey = map(np.asarray, (src, emask, newkey))

    # python oracle (same as tests/test_ops.py)
    prev = np.concatenate([[-1], s[:-1]])
    is_head = (s != prev) & (s != SENTINEL)
    last, seen, c = B, False, 0
    osrc = np.zeros(T, np.int64)
    oem = np.zeros(T, bool)
    onk = np.full(T, SENTINEL, np.int64)
    onn = 0
    for i in range(T):
        if is_head[i]:
            last = order[i] if order[i] < B else B
            seen = True
            if order[i] >= B:
                c += 1
        hv = last if seen else B
        local = hv if hv < B else bc + c - 1
        valid = s[i] != SENTINEL
        in_cap = local < cap
        if valid and order[i] >= B and in_cap:
            osrc[i] = local
            oem[i] = True
        if is_head[i] and order[i] >= B and in_cap:
            onk[i] = s[i]
            onn += 1
    np.testing.assert_array_equal(emask, oem)
    np.testing.assert_array_equal(src[oem], osrc[oem])
    np.testing.assert_array_equal(newkey, onk)
    assert int(n_new) == onn, (int(n_new), onn)
    return None


# ---------------------------------------------------------------------------
# Bucketed full-graph engine (ops/spmm.py) + Pallas DMA gather


@check("bucketed_spmm_compiled")
def _():
    from quiver_tpu.ops.spmm import spmm_csr, build_bucket_plan
    rng = np.random.default_rng(0)
    V = 2000
    deg = rng.integers(0, 8, V)
    deg[3] = 0
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1]))
    D = 128
    x = rng.normal(size=(V, D)).astype(np.float32)
    plan = build_bucket_plan(indptr, indices)
    worst = 0.0
    for aggr in ("mean", "sum"):
        got = np.asarray(spmm_csr(indptr, indices, jnp.asarray(x),
                                  aggr=aggr, plan=plan))
        want = np.zeros((V, D))
        for v in range(V):
            nb = indices[indptr[v]:indptr[v + 1]]
            if len(nb):
                want[v] = x[nb].sum(0) / (len(nb) if aggr == "mean" else 1)
        err = _maxerr(got, want)
        worst = max(worst, err)
        assert err < 1e-3, (aggr, err)
    return worst


@check("bucketed_gat_compiled")
def _():
    from quiver_tpu.ops.spmm import gat_csr, build_bucket_plan
    rng = np.random.default_rng(0)
    V = 2000
    deg = rng.integers(0, 8, V)
    deg[3] = 0
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1]))
    H, C = 4, 16
    xw = rng.normal(size=(V, H, C)).astype(np.float32)
    att = rng.normal(size=(H, C)).astype(np.float32)
    a_dst = rng.normal(size=(V, H)).astype(np.float32)
    a_src = (xw * att[None]).sum(-1)
    plan = build_bucket_plan(indptr, indices)
    got = np.asarray(gat_csr(indptr, indices, jnp.asarray(xw), None,
                             jnp.asarray(a_dst), plan=plan,
                             att_src=jnp.asarray(att)))
    want = np.zeros((V, H, C))
    for v in range(V):
        nb = indices[indptr[v]:indptr[v + 1]]
        if len(nb) == 0:
            continue
        e = a_src[nb].astype(np.float64) + a_dst[v][None]
        e = np.where(e >= 0, e, 0.2 * e)
        e = e - e.max(0, keepdims=True)
        w = np.exp(e)
        w = w / w.sum(0, keepdims=True)
        want[v] = (xw[nb] * w[..., None]).sum(0)
    err = _maxerr(got, want)
    assert err < 1e-3, err
    return err


@check("pallas_gather_compiled")
def _():
    from quiver_tpu.ops.gather import gather_rows_pallas
    rng = np.random.default_rng(10)
    V, D, N = 30000, 128, 4096
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = rng.integers(0, V, N).astype(np.int32)
    got = np.asarray(gather_rows_pallas(table, jnp.asarray(ids)))
    err = _maxerr(got, np.asarray(table)[ids])
    assert err == 0.0, err
    return err


def main():
    quiver_tpu.enable_compilation_cache()
    dev = jax.devices()[0]
    backend = jax.default_backend()
    print(f"backend={backend} device={dev}", flush=True)
    if backend != "tpu":
        print("NOT a TPU backend — this tier must run on the real chip",
              file=sys.stderr)
        sys.exit(2)
    for fn in CHECKS:
        fn()
    all_pass = all(r["status"] == "pass" for r in RESULTS)
    out = {"metric": "tpu_compiled_correctness",
           "backend": backend, "device": str(dev),
           "interpret": False,
           "results": RESULTS, "all_pass": all_pass}
    Path(__file__).resolve().parent.parent.joinpath(
        "TPU_TESTS.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"metric": "tpu_compiled_correctness",
                      "checks": len(RESULTS), "all_pass": all_pass}))
    sys.exit(0 if all_pass else 1)


if __name__ == "__main__":
    main()
