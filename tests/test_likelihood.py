"""Likelihood adapter tests (mirroring /root/reference/tests/test_likelihood.py):
NaN/Inf/exception handling, bounds validation, dimension checks."""
import numpy as np
import pytest

from bobe_tpu.likelihood import Likelihood


def quad(x):
    return -np.sum(x**2)


BOUNDS = np.array([[-1.0, 1.0], [-2.0, 2.0]]).T


def test_basic_eval():
    lk = Likelihood(quad, ["a", "b"], param_bounds=BOUNDS)
    assert lk(np.array([0.5, 0.5])) == pytest.approx(-0.5)
    assert lk.ndim == 2
    assert lk.logprior_vol == pytest.approx(np.log(2.0 * 4.0))


def test_nan_inf_to_minus_inf():
    lk = Likelihood(lambda x: np.nan, ["a"], param_bounds=np.array([[0.0], [1.0]]))
    assert lk(np.array([0.5])) == lk.minus_inf
    lk2 = Likelihood(lambda x: np.inf, ["a"], param_bounds=np.array([[0.0], [1.0]]))
    assert lk2(np.array([0.5])) == lk2.minus_inf
    lk3 = Likelihood(lambda x: -1e300, ["a"], param_bounds=np.array([[0.0], [1.0]]),
                     minus_inf=-1e10)
    assert lk3(np.array([0.5])) == -1e10


def test_exception_swallowed():
    def boom(x):
        raise RuntimeError("theory code exploded")

    lk = Likelihood(boom, ["a"], param_bounds=np.array([[0.0], [1.0]]))
    assert lk(np.array([0.5])) == lk.minus_inf


def test_bounds_shape_validation():
    with pytest.raises(ValueError):
        Likelihood(quad, ["a", "b"], param_bounds=np.zeros((3, 2)))
    with pytest.raises(ValueError):
        Likelihood(quad, ["a", 2], param_bounds=BOUNDS)


def test_dimension_mismatch():
    lk = Likelihood(quad, ["a", "b"], param_bounds=BOUNDS)
    with pytest.raises(ValueError):
        lk(np.array([1.0, 2.0, 3.0]))
    with pytest.raises(ValueError):
        lk(np.zeros((2, 2)))


def test_default_unit_cube_bounds():
    lk = Likelihood(quad, ["a", "b"])
    np.testing.assert_allclose(lk.param_bounds, np.array([[0, 1], [0, 1]]).T)
    assert lk.logprior_vol == pytest.approx(0.0)


def test_logprior_vol_no_overflow_high_d():
    """log prior volume must be sum(log(widths)): 31 dims of 1e10-wide ranges
    overflow np.prod to inf (and tiny widths underflow to 0 -> -inf),
    poisoning every evaluation through the +/-inf shift."""
    d = 31
    bounds = np.vstack([np.full(d, -5e9), np.full(d, 5e9)])
    lk = Likelihood(lambda x: 0.0, [f"p{i}" for i in range(d)],
                    param_bounds=bounds)
    assert np.isfinite(lk.logprior_vol)
    assert lk.logprior_vol == pytest.approx(d * np.log(1e10))

    tiny = np.vstack([np.zeros(d), np.full(d, 1e-12)])
    lk2 = Likelihood(lambda x: 0.0, [f"p{i}" for i in range(d)],
                     param_bounds=tiny)
    assert np.isfinite(lk2.logprior_vol)
    assert lk2.logprior_vol == pytest.approx(d * np.log(1e-12))
