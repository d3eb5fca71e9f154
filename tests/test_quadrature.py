"""Quadrature exactness + parity with the reference float32 tables
(/root/reference/fea_test.cu:28-31)."""
import numpy as np
import pytest

from tpufem.fem.quadrature import (TRI7_FP32_R, TRI7_FP32_S, TRI7_FP32_T,
                                   TRI7_FP32_W, tetrahedron_rule,
                                   triangle_rule)


def _monomial_integral_triangle(p, q):
    # int over ref triangle of r^p s^q = p! q! / (p+q+2)!
    from math import factorial
    return factorial(p) * factorial(q) / factorial(p + q + 2)


def _monomial_integral_tet(p, q, r):
    from math import factorial
    return (factorial(p) * factorial(q) * factorial(r)
            / factorial(p + q + r + 3))


@pytest.mark.parametrize("degree", [1, 2, 3, 5])
def test_triangle_rule_exactness(degree):
    rule = triangle_rule(degree)
    np.testing.assert_allclose(rule.weights.sum(), 0.5, rtol=1e-14)
    for p in range(degree + 1):
        for q in range(degree + 1 - p):
            val = (rule.weights
                   * rule.points[:, 0] ** p * rule.points[:, 1] ** q).sum()
            np.testing.assert_allclose(
                val, _monomial_integral_triangle(p, q), rtol=1e-13,
                err_msg=f"degree {degree} fails on r^{p} s^{q}")


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_tetrahedron_rule_exactness(degree):
    rule = tetrahedron_rule(degree)
    np.testing.assert_allclose(rule.weights.sum(), 1 / 6, rtol=1e-14)
    for p in range(degree + 1):
        for q in range(degree + 1 - p):
            for r in range(degree + 1 - p - q):
                val = (rule.weights * rule.points[:, 0] ** p
                       * rule.points[:, 1] ** q
                       * rule.points[:, 2] ** r).sum()
                np.testing.assert_allclose(
                    val, _monomial_integral_tet(p, q, r), rtol=1e-12,
                    err_msg=f"degree {degree} fails on r^{p}s^{q}t^{r}")


def test_tri7_matches_reference_tables():
    """The exact rule reproduces the reference's float32 constants to fp32."""
    rule = triangle_rule(5)
    np.testing.assert_allclose(rule.weights, TRI7_FP32_W, atol=6e-9)
    np.testing.assert_allclose(rule.points[:, 0], TRI7_FP32_R, atol=6e-8)
    np.testing.assert_allclose(rule.points[:, 1], TRI7_FP32_S, atol=6e-8)
    t = 1 - rule.points.sum(axis=1)
    np.testing.assert_allclose(t, TRI7_FP32_T, atol=2e-7)


def test_barycentric():
    rule = triangle_rule(5)
    bc = rule.barycentric()
    np.testing.assert_allclose(bc.sum(axis=1), 1.0, rtol=1e-14)
    assert (bc > 0).all()
