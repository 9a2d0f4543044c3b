"""Special functions needed by GeneralizedESDTestAD, in pure numpy.

scipy is not available in this environment; the reference uses
``scipy.stats.t.ppf`` (_detector_1d.py:326-343). The incomplete beta
continued fraction below is the classic Lentz-method evaluation
(public textbook algorithm); the Student-t quantile is obtained by
bisection on the CDF, which is plenty for the ESD fit (a few dozen
evaluations per series).
"""

from __future__ import annotations

import math


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the regularized incomplete beta."""
    MAXIT, EPS, FPMIN = 200, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
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
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_cdf(x: float, df: float) -> float:
    if df <= 0:
        raise ValueError("df must be positive")
    if x == 0.0:
        return 0.5
    p = 0.5 * betainc(df / 2.0, 0.5, df / (df + x * x))
    return 1.0 - p if x > 0 else p


def t_ppf(p: float, df: float) -> float:
    """Student-t quantile via bisection on t_cdf (|err| < 1e-12)."""
    if not 0.0 < p < 1.0:
        if p <= 0.0:
            return -math.inf
        return math.inf
    lo, hi = -1.0, 1.0
    while t_cdf(lo, df) > p:
        lo *= 2.0
        if lo < -1e10:
            break
    while t_cdf(hi, df) < p:
        hi *= 2.0
        if hi > 1e10:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-13 * max(1.0, abs(mid)):
            break
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# closed-form approximations (SQL-expressible; see __spark_entry__ esd oracle)
# ---------------------------------------------------------------------------

def norminv_acklam(p: float) -> float:
    """Acklam's rational approximation to the standard normal quantile
    (|rel err| < 1.15e-9) — closed-form arithmetic only, so a SQL oracle
    can evaluate the identical expression."""
    a1, a2, a3 = -3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02
    a4, a5, a6 = 1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00
    b1, b2, b3 = -5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02
    b4, b5 = 6.680131188771972e+01, -1.328068155288572e+01
    c1, c2, c3 = -7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00
    c4, c5, c6 = -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00
    d1, d2, d3, d4 = 7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00, 3.754408661907416e+00
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2.0 * math.log(p))
        return (((((c1 * q + c2) * q + c3) * q + c4) * q + c5) * q + c6) / \
               ((((d1 * q + d2) * q + d3) * q + d4) * q + 1.0)
    if p > phigh:
        q = math.sqrt(-2.0 * math.log(1.0 - p))
        return -(((((c1 * q + c2) * q + c3) * q + c4) * q + c5) * q + c6) / \
               ((((d1 * q + d2) * q + d3) * q + d4) * q + 1.0)
    q = p - 0.5
    r = q * q
    return (((((a1 * r + a2) * r + a3) * r + a4) * r + a5) * r + a6) * q / \
           (((((b1 * r + b2) * r + b3) * r + b4) * r + b5) * r + 1.0)


def t_ppf_hill(p: float, df: float) -> float:
    """Student-t quantile via Hill's closed-form expansion (Algorithm
    396, CACM 1970) with Acklam's normal quantile — pure arithmetic, no
    iteration, so the identical expression runs in a SQL oracle.
    |rel err| ~ 1e-6 vs the exact bisection t_ppf; used by
    esd_ad(..., portable=True) so the fitted lambda is reproducible
    cross-engine. One-tail convention matching t_ppf: returns t with
    P(T <= t) = p. Requires p >= 0.5 (the ESD fit only asks there)."""
    if not 0.5 <= p < 1.0:
        raise ValueError("t_ppf_hill expects 0.5 <= p < 1")
    q = 2.0 * (1.0 - p)  # two-tail probability
    n = float(df)
    hpi = math.pi / 2.0
    if n == 1.0:
        qh = q * hpi
        return math.cos(qh) / math.sin(qh)
    if n == 2.0:
        return math.sqrt(2.0 / (q * (2.0 - q)) - 2.0)
    a = 1.0 / (n - 0.5)
    b = 48.0 / (a * a)
    c0 = ((20700.0 * a / b - 98.0) * a - 16.0) * a + 96.36
    d = ((94.5 / (b + c0) - 3.0) / b + 1.0) * math.sqrt(a * hpi) * n
    x0 = d * q
    y0 = x0 ** (2.0 / n)
    if y0 > 0.05 + a:
        x1 = -norminv_acklam(q * 0.5)
        y1 = x1 * x1
        c1 = c0 + 0.3 * (n - 4.5) * (x1 + 0.6) if n < 5.0 else c0
        c2 = (((0.05 * d * x1 - 5.0) * x1 - 7.0) * x1 - 2.0) * x1 + b + c1
        y2 = (((((0.4 * y1 + 6.3) * y1 + 36.0) * y1 + 94.5) / c2 - y1 - 3.0) / b + 1.0) * x1
        y3 = a * y2 * y2
        y4 = math.exp(y3) - 1.0 if y3 > 0.002 else 0.5 * y3 * y3 + y3
    else:
        y4 = ((1.0 / (((n + 6.0) / (n * y0) - 0.089 * d - 0.822) * (n + 2.0) * 3.0)
               + 0.5 / (n + 4.0)) * y0 - 1.0) * (n + 1.0) / (n + 2.0) + 1.0 / y0
    return math.sqrt(n * y4)
