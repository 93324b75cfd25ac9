"""DCP engine unit tests (curvature/sign composition rules)."""

import numpy as np
import pytest

import epsilon_tpu as ep
from epsilon_tpu.frontend.dcp import Curvature, Sign


def _c(e):
    return e.dcp_props.curvature


def test_leaf_properties():
    x = ep.Variable(3)
    assert _c(x) == Curvature.AFFINE
    assert _c(ep._wrap(np.ones(3))) == Curvature.CONSTANT
    assert ep._wrap(np.ones((2, 2))).dcp_props.sign == Sign.POSITIVE
    assert ep._wrap(-2.0).dcp_props.sign == Sign.NEGATIVE


def test_affine_combinations():
    x = ep.Variable(3)
    A = np.random.RandomState(0).randn(2, 3)
    assert _c(ep._wrap(A) * x + 1.0) == Curvature.AFFINE
    assert _c(-(x - 2)) == Curvature.AFFINE
    assert _c(ep.sum_entries(x)) == Curvature.AFFINE


def test_convex_atoms():
    x = ep.Variable(3)
    for e in [ep.norm1(x), ep.norm2(x), ep.sum_squares(x),
              ep.max_entries(x), ep.log_sum_exp(x),
              ep.sum_entries(ep.exp(x)), ep.sum_largest(x, 2),
              ep.abs(x), ep.huber(x)]:
        assert e.dcp_props.convex and not e.dcp_props.affine


def test_concave_atoms():
    x = ep.Variable(3)
    X = ep.Variable(3, 3)
    for e in [ep.sum_entries(ep.log(x)), ep.log_det(X),
              ep.min_entries(x), ep.sqrt(x), ep.geo_mean(x),
              ep.lambda_min(X), ep.sum_entries(ep.entr(x))]:
        assert e.dcp_props.concave and not e.dcp_props.affine


def test_composition_rules():
    x = ep.Variable(3)
    # convex increasing of convex: exp(norm1) is convex
    assert ep.sum_entries(ep.exp(ep.norm1(x))).dcp_props.convex
    # convex of affine: fine
    assert ep.norm2(2 * x - 1).dcp_props.convex
    # negation flips
    assert (-ep.norm1(x)).dcp_props.concave
    # convex + convex = convex
    assert (ep.norm1(x) + ep.sum_squares(x)).dcp_props.convex
    # convex - convex = unknown
    e = ep.norm1(x) - ep.sum_squares(x)
    assert e.dcp_props.curvature == Curvature.UNKNOWN
    # signed composition: square of positive-scaled abs is convex
    assert ep.square(ep.abs(x)).dcp_props.convex
    # scalar sign matters: -2 * convex = concave
    assert (-2.0 * ep.norm1(x)).dcp_props.concave


def test_sign_propagation():
    x = ep.Variable(3)
    assert ep.abs(x).dcp_props.sign == Sign.POSITIVE
    assert (-ep.abs(x)).dcp_props.sign == Sign.NEGATIVE
    assert ep.square(x).dcp_props.sign == Sign.POSITIVE


def test_matmul_precision_forced():
    import jax
    assert jax.config.jax_default_matmul_precision == "highest"
