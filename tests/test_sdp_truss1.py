"""truss1 no-certificate regression (VERDICT round-1 item 5).

Under the reference checker's semantics (sdpcodegen: min <C,X>,
<A_i,X> = b_i, dual slack S = C - sum_i y_i A_i must be PSD), SDPLIB's
truss1 admits NO optimality certificate: max over y of lambda_min(S(y))
is strictly negative, so no dual-feasible y — and hence no PSD S witness
— exists.  The reference pipeline hits the same wall but hides it
(run.py's SDP loop ignores subprocess exit codes, SURVEY.md §5.3); our
CLI reports the instance failure explicitly.  This test pins the finding
as checkable code.

lambda_min(C - sum y_i A_i) is concave in y, so a local maximizer found
by direct search is the global one (up to solver tolerance).
"""

import numpy as np
import pytest

from otti_tpu.io import sdpa

TRUSS1 = "/root/reference/datasets/SDP/full/truss1.dat-s"


def test_truss1_dual_infeasible_no_certificate():
    prob = sdpa.parse_dats(TRUSS1)

    def lmin(y):
        S = prob.C - sum(yi * Ai for yi, Ai in zip(y, prob.A))
        return float(np.linalg.eigvalsh(S)[0])

    from scipy.optimize import minimize

    rng = np.random.default_rng(0)
    best = -np.inf
    for k in range(12):
        y0 = rng.normal(scale=(0.0 if k == 0 else 10.0 * k), size=prob.m)
        r = minimize(
            lambda y: -lmin(y),
            y0,
            method="Nelder-Mead",
            options={"maxiter": 6000, "xatol": 1e-9, "fatol": 1e-12},
        )
        best = max(best, -float(r.fun))
    # max-over-y lambda_min(S) stays firmly negative (~ -0.5): there is no
    # PSD dual slack, so no Cholesky witness and no optimality certificate.
    assert best < -0.1, f"unexpected near-feasible dual: lambda_min={best}"


def test_truss1_cli_reports_failure_not_fake_success(tmp_path, capsys):
    """The orchestrator must surface the no-certificate instance as a
    failure (nonzero exit), unlike the reference's ignored exit codes."""
    from otti_tpu import cli

    rc = cli.main(
        [
            "--sdp",
            "--custom",
            TRUSS1,
            "--cpu",
            "--out",
            str(tmp_path),
        ]
    )
    out = capsys.readouterr().out
    assert rc == 1
    assert "INSTANCE FAILED truss1.dat-s" in out
