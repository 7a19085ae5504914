"""Unit tests for the numerical primitives in bobe_tpu.ops.

The dense (unpadded) formulas from the reference implementation serve as the
correctness oracle: masked/padded results must agree with dense results on the
active block to tight tolerances.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.special as sps

from bobe_tpu.ops import chol as chol_ops
from bobe_tpu.ops import fantasy as fx
from bobe_tpu.ops import kernels as kr
from bobe_tpu.ops import mll as mll_ops
from bobe_tpu.ops import optimize as opt_ops
from bobe_tpu.ops import special as sp


# ----------------------------------------------------------------- special fns

def test_erfcx_matches_scipy():
    x = np.concatenate([np.linspace(-5, 5, 201), np.linspace(5, 200, 100)])
    got = np.asarray(sp.erfcx(jnp.asarray(x)))
    want = sps.erfcx(x)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_log1mexp_matches_longdouble_oracle():
    x = -np.logspace(-10, 2, 100)
    got = np.asarray(sp.log1mexp(jnp.asarray(x)))
    # high-precision oracle (float64 log1p(-exp(x)) itself cancels near 0)
    want = np.asarray(np.log1p(-np.exp(np.asarray(x, dtype=np.longdouble))),
                      dtype=np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_log_ei_helper_consistent_with_direct():
    # moderate u: log(ei_helper) == log_ei_helper
    u = jnp.linspace(-0.9, 5.0, 50)
    np.testing.assert_allclose(
        np.asarray(sp.log_ei_helper(u)), np.log(np.asarray(sp.ei_helper(u))), rtol=1e-9
    )
    # deep tail stays finite and monotone
    u = jnp.linspace(-40.0, -2.0, 100)
    vals = np.asarray(sp.log_ei_helper(u))
    assert np.all(np.isfinite(vals))
    assert np.all(np.diff(vals) > 0)


# ------------------------------------------------------------------- kernels

def _rand(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(size=(n, d)))


def _dense_rbf(xa, xb, ls, amp):
    d2 = np.sum((np.asarray(xa)[:, None, :] / ls - np.asarray(xb)[None, :, :] / ls) ** 2, -1)
    return amp * np.exp(-0.5 * d2)


def _dense_matern(xa, xb, ls, amp):
    d2 = np.sum((np.asarray(xa)[:, None, :] / ls - np.asarray(xb)[None, :, :] / ls) ** 2, -1)
    d = np.sqrt(np.maximum(d2, 1e-30))
    s5 = np.sqrt(5.0)
    return amp * (1 + s5 * d + 5.0 / 3.0 * d2) * np.exp(-s5 * d)


@pytest.mark.parametrize("name,dense", [("rbf", _dense_rbf), ("matern", _dense_matern)])
def test_cross_kernel_matches_dense(name, dense):
    xa, xb = _rand(7, 3, 1), _rand(5, 3, 2)
    ls = jnp.asarray([0.3, 0.7, 1.2])
    got = np.asarray(kr.cross_kernel(name, xa, xb, ls, 2.5))
    np.testing.assert_allclose(got, dense(xa, xb, np.asarray(ls), 2.5), rtol=1e-10, atol=1e-12)


def test_gram_masked_pad_structure():
    cap, n, d = 16, 9, 2
    x = jnp.concatenate([_rand(n, d, 3), jnp.full((cap - n, d), 0.5)])
    mask = (jnp.arange(cap) < n).astype(x.dtype)
    K = kr.gram_masked("rbf", x, mask, jnp.ones(d), 1.7, 1e-8)
    Kd = _dense_rbf(x[:n], x[:n], np.ones(d), 1.7) + 1e-8 * np.eye(n)
    np.testing.assert_allclose(np.asarray(K[:n, :n]), Kd, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(K[n:, n:]), np.eye(cap - n), atol=0)
    assert np.all(np.asarray(K[:n, n:]) == 0)


# ------------------------------------------------------------------ cholesky

def test_padded_cholesky_and_solve_exact():
    cap, n, d = 24, 11, 3
    x = jnp.concatenate([_rand(n, d, 4), jnp.full((cap - n, d), 0.5)])
    mask = (jnp.arange(cap) < n).astype(x.dtype)
    K = kr.gram_masked("matern", x, mask, 0.5 * jnp.ones(d), 3.0, 1e-6)
    L = chol_ops.cholesky(K)
    # padded factor is block-diagonal [[L_n, 0], [0, I]]
    Ln = np.linalg.cholesky(np.asarray(K[:n, :n]))
    np.testing.assert_allclose(np.asarray(L[:n, :n]), Ln, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(L[n:, n:]), np.eye(cap - n), atol=1e-12)
    # solves on padded rhs match dense solves on the active block
    b = jnp.concatenate([jnp.asarray(np.random.default_rng(0).normal(size=n)), jnp.zeros(cap - n)])
    got = chol_ops.cho_solve(L, b)
    want = np.linalg.solve(np.asarray(K[:n, :n]), np.asarray(b[:n]))
    np.testing.assert_allclose(np.asarray(got[:n]), want, rtol=1e-8)
    assert np.all(np.asarray(got[n:]) == 0)


def test_cholesky_jittered_recovers_from_bad_matrix():
    n = 8
    x = _rand(n, 2, 5)
    # nearly singular: duplicate rows, tiny noise
    x = x.at[1].set(x[0] + 1e-9)
    mask = jnp.ones(n)
    K = kr.gram_masked("rbf", x, mask, jnp.ones(2) * 0.5, 1.0, 0.0)
    L = chol_ops.cholesky_jittered(K.astype(jnp.float32), mask, jnp.asarray(1.0, jnp.float32))
    assert bool(jnp.all(jnp.isfinite(L)))


def test_extend_cholesky_block_matches_full():
    cap, n, b, d = 16, 6, 3, 2
    rng = np.random.default_rng(7)
    xa = jnp.asarray(rng.uniform(size=(n, d)))
    xb = jnp.asarray(rng.uniform(size=(b, d)))
    ls, amp, noise = jnp.ones(d) * 0.6, 2.0, 1e-8
    x_pad = jnp.concatenate([xa, jnp.full((cap - n, d), 0.5)])
    mask = (jnp.arange(cap) < n).astype(jnp.float64)
    K = kr.gram_masked("rbf", x_pad, mask, ls, amp, noise)
    L = chol_ops.cholesky(K)

    K21 = kr.cross_kernel("rbf", xb, x_pad, ls, amp) * mask[None, :]
    K22 = kr.cross_kernel("rbf", xb, xb, ls, amp) + noise * jnp.eye(b)
    L21, L22 = chol_ops.extend_cholesky_block(L, K21, K22)

    x_all = np.concatenate([np.asarray(xa), np.asarray(xb)])
    K_full = _dense_rbf(x_all, x_all, np.asarray(ls), 2.0) + noise * np.eye(n + b)
    L_full = np.linalg.cholesky(K_full)
    np.testing.assert_allclose(np.asarray(L21[:, :n]), L_full[n:, :n], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(L22), L_full[n:, n:], rtol=1e-8)


def test_rank1_extend_matches_reference_formula():
    n, d = 7, 2
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    xnew = jnp.asarray(rng.uniform(size=(d,)))
    ls, amp, noise = jnp.ones(d), 1.5, 1e-8
    K = kr.cross_kernel("rbf", x, x, ls, amp) + noise * jnp.eye(n)
    L = jnp.linalg.cholesky(K)
    k = kr.cross_kernel("rbf", x, xnew[None], ls, amp)[:, 0]
    Lp = chol_ops.rank1_extend(L, k, amp + noise)
    x_all = jnp.concatenate([x, xnew[None]])
    K_full = kr.cross_kernel("rbf", x_all, x_all, ls, amp) + noise * jnp.eye(n + 1)
    np.testing.assert_allclose(np.asarray(Lp), np.linalg.cholesky(np.asarray(K_full)), rtol=1e-8)


# ------------------------------------------------------------------------ MLL

def test_gp_mll_matches_dense_formula():
    cap, n, d = 16, 10, 2
    rng = np.random.default_rng(3)
    x = jnp.concatenate([jnp.asarray(rng.uniform(size=(n, d))), jnp.full((cap - n, d), 0.5)])
    y = jnp.concatenate([jnp.asarray(rng.normal(size=n)), jnp.zeros(cap - n)])
    mask = (jnp.arange(cap) < n).astype(jnp.float64)
    K = kr.gram_masked("rbf", x, mask, jnp.ones(d), 1.3, 1e-6)
    got = float(mll_ops.gp_mll(K, y, n))
    Kd = np.asarray(K[:n, :n])
    yd = np.asarray(y[:n])
    Ld = np.linalg.cholesky(Kd)
    alpha = np.linalg.solve(Kd, yd)
    want = -0.5 * yd @ alpha - np.sum(np.log(np.diag(Ld))) - 0.5 * n * np.log(2 * np.pi)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_distribution_logprobs():
    from scipy import stats

    x = 1.7
    np.testing.assert_allclose(
        float(mll_ops.lognormal_logprob(x, 0.3, 1.2)),
        stats.lognorm.logpdf(x, s=1.2, scale=np.exp(0.3)), rtol=1e-9)
    np.testing.assert_allclose(
        float(mll_ops.halfcauchy_logprob(x, 0.5)),
        stats.halfcauchy.logpdf(x, scale=0.5), rtol=1e-9)
    np.testing.assert_allclose(
        float(mll_ops.uniform_logprob(x, 1.0, 3.0)), -np.log(2.0), rtol=1e-12)
    assert float(mll_ops.uniform_logprob(5.0, 1.0, 3.0)) == -np.inf


# ----------------------------------------------------------- fantasy variance

def test_wip_sweep_matches_rank1_reference_path():
    """The batched sweep must equal the reference algorithm: rank-1 Cholesky
    extension + triangular solve per candidate (gp.py:552-576)."""
    cap, n, d, m = 32, 12, 2, 6
    rng = np.random.default_rng(9)
    x_act = jnp.asarray(rng.uniform(size=(n, d)))
    x_pad = jnp.concatenate([x_act, jnp.full((cap - n, d), 0.5)])
    mask = (jnp.arange(cap) < n).astype(jnp.float64)
    mc = jnp.asarray(rng.uniform(size=(m, d)))
    ls, amp, noise = jnp.asarray([0.4, 0.8]), 2.2, 1e-8

    K = kr.gram_masked("rbf", x_pad, mask, ls, amp, noise)
    L = chol_ops.cholesky(K)
    V, var = fx.posterior_batch("rbf", x_pad, mask, L, mc, ls, amp, noise)
    acq = np.asarray(fx.wip_sweep("rbf", mc, V, var, ls, amp, noise, 1.0, use_std=False))

    # reference-path oracle (dense, per candidate)
    Ld = jnp.linalg.cholesky(kr.cross_kernel("rbf", x_act, x_act, ls, amp) + noise * jnp.eye(n))
    K_train_mc = kr.cross_kernel("rbf", x_act, mc, ls, amp)
    want = []
    for c in range(m):
        kc = kr.cross_kernel("rbf", x_act, mc[c][None], ls, amp)[:, 0]
        Lp = chol_ops.rank1_extend(Ld, kc, amp + noise)
        k_new_mc = kr.cross_kernel("rbf", mc[c][None], mc, ls, amp)
        k12 = jnp.vstack([K_train_mc, k_new_mc])
        vv = chol_ops.tri_solve(Lp, k12)
        v = (amp + noise) - jnp.sum(vv * vv, axis=0)
        v = jnp.maximum(v, 1e-12)
        want.append(float(jnp.mean(v)))
    np.testing.assert_allclose(acq, np.asarray(want), rtol=1e-7)


def test_fantasy_var_single_matches_sweep_on_pool_points():
    cap, n, d, m = 32, 10, 3, 5
    rng = np.random.default_rng(13)
    x_pad = jnp.concatenate(
        [jnp.asarray(rng.uniform(size=(n, d))), jnp.full((cap - n, d), 0.5)])
    mask = (jnp.arange(cap) < n).astype(jnp.float64)
    mc = jnp.asarray(rng.uniform(size=(m, d)))
    ls, amp, noise = jnp.ones(d) * 0.5, 1.0, 1e-8
    K = kr.gram_masked("matern", x_pad, mask, ls, amp, noise)
    L = chol_ops.cholesky(K)
    V, var = fx.posterior_batch("matern", x_pad, mask, L, mc, ls, amp, noise)
    acq = fx.wip_sweep("matern", mc, V, var, ls, amp, noise, 1.0, use_std=True)
    fv0 = fx.fantasy_var_single("matern", x_pad, mask, L, mc[2], mc, V, var, ls, amp, noise)
    np.testing.assert_allclose(float(jnp.mean(jnp.sqrt(fv0))), float(acq[2]), rtol=1e-8)


# ------------------------------------------------------------------ optimizer

def test_minimize_restarts_quadratic():
    target = jnp.asarray([0.3, -0.2, 0.7])
    fun = lambda x: jnp.sum((x - target) ** 2)
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, size=(6, 3)))
    x, f = opt_ops.minimize_restarts(fun, x0, bounds=jnp.asarray([[-1.0], [1.0]]) * jnp.ones((2, 3)),
                                     maxiter=200)
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-4)
    assert float(f) < 1e-8


def test_minimize_restarts_return_all():
    """return_all exposes every restart endpoint; its best row must match the
    default (best-only) return, and f_all must equal fun at each endpoint."""
    target = jnp.asarray([0.3, -0.2, 0.7])
    fun = lambda x: jnp.sum((x - target) ** 2)
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, size=(5, 3)))
    bounds = jnp.asarray([[-1.0], [1.0]]) * jnp.ones((2, 3))
    x_all, f_all = opt_ops.minimize_restarts(fun, x0, bounds=bounds,
                                             maxiter=200, return_all=True)
    assert x_all.shape == (5, 3) and f_all.shape == (5,)
    x_best, f_best = opt_ops.minimize_restarts(fun, x0, bounds=bounds,
                                               maxiter=200)
    i = int(jnp.argmin(f_all))
    np.testing.assert_allclose(np.asarray(x_all[i]), np.asarray(x_best),
                               atol=1e-10)
    np.testing.assert_allclose(float(f_all[i]), float(f_best), atol=1e-10)
    # reported values are consistent with the returned points
    for r in range(5):
        np.testing.assert_allclose(float(fun(x_all[r])), float(f_all[r]),
                                   atol=1e-8)


def test_minimize_restarts_respects_bounds():
    fun = lambda x: jnp.sum(x)  # minimum at the lower bound
    x0 = jnp.asarray([[0.5, 0.5]])
    bounds = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])
    x, _ = opt_ops.minimize_restarts(fun, x0, bounds=bounds, maxiter=300)
    assert np.all(np.asarray(x) >= 0.0) and np.all(np.asarray(x) <= 1.0)
    assert np.all(np.asarray(x) < 1e-4)


def test_minimize_scipy_parity():
    target = jnp.asarray([0.1, 0.9])
    fun = lambda x: jnp.sum((x - target) ** 2)
    x0 = jnp.asarray([[0.4, 0.4], [0.6, 0.2]])
    x, f = opt_ops.minimize_scipy_restarts(fun, x0, bounds=jnp.asarray([[0.0], [1.0]]) * jnp.ones((2, 2)))
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-5)


def test_minimize_scipy_threaded_matches_serial(monkeypatch):
    """Thread-parallel restarts (multi-core hosts) must select the same
    optimum as the serial loop: restarts are independent, so only wall time
    may differ. A multimodal objective makes a selection bug visible."""
    fun = lambda x: jnp.sum(jnp.cos(3.0 * x) + 0.1 * (x - 0.3) ** 2)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-2.0, 2.0, size=(6, 3)))
    bounds = jnp.asarray([[-2.0] * 3, [2.0] * 3])
    monkeypatch.setattr(opt_ops.os, "cpu_count", lambda: 1)
    x_ser, f_ser = opt_ops.minimize_scipy_restarts(fun, x0, bounds=bounds)
    monkeypatch.setattr(opt_ops.os, "cpu_count", lambda: 4)
    x_thr, f_thr = opt_ops.minimize_scipy_restarts(fun, x0, bounds=bounds)
    np.testing.assert_allclose(np.asarray(x_thr), np.asarray(x_ser),
                               rtol=1e-12, atol=1e-12)
    assert float(f_thr) == float(f_ser)
