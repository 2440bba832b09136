"""Scipy-free statistics helpers: Student-t CDF via the regularized
incomplete beta function (continued-fraction evaluation, Numerical Recipes
style), used by the AOD sketch's Welch t-test
(/root/reference/src/aod_sketch_c_adapter.cpp:305-318 uses boost's
students_t distribution; this reproduces the same closed form)."""

from __future__ import annotations

import math


def _betacf(a: float, b: float, x: float) -> float:
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a,b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def student_t_sf(t: float, df: float) -> float:
    """P(T > t) for Student-t with df degrees of freedom."""
    if df <= 0 or math.isnan(t):
        return float("nan")
    x = df / (df + t * t)
    p = 0.5 * betainc_reg(df / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def welch_t_test(m1, v1, n1, m2, v2, n2) -> tuple[float, float, float]:
    """Two-sided Welch unequal-variance t-test on summary stats.
    Returns (t_statistic, degrees_of_freedom, p_value) — the closed form at
    /root/reference/src/aod_sketch_c_adapter.cpp:305-318."""
    se2 = v1 / n1 + v2 / n2
    if se2 <= 0:
        return float("nan"), float("nan"), float("nan")
    t = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / (
        (v1 / n1) ** 2 / (n1 - 1.0) + (v2 / n2) ** 2 / (n2 - 1.0)
    )
    p = 2.0 * student_t_sf(abs(t), df)
    return t, df, p
