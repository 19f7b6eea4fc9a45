"""truss1 no-certificate regression, PROVEN (VERDICT r02 next #7).

Under the reference checker's semantics (sdpcodegen: min <C,X>,
<A_i,X> = b_i, dual slack S = C - sum_i y_i A_i must be PSD), SDPLIB's
truss1 admits NO optimality certificate: the dual LMI S(y) >= 0 is
infeasible.  Round 2 evidenced this with a Nelder-Mead search; this
round replaces the numerics with a Farkas witness X (X >= 0, <A_i,X> = 0,
<C,X> < 0) verified in EXACT rational arithmetic
(otti_tpu/oracle/sdp_infeas.py) — for every y,
lambda_min(S(y)) <= <C,X>/tr(X) < 0, closing the "maybe the solver just
didn't find it" gap.  The reference pipeline hits the same wall but
hides it (run.py's SDP loop ignores subprocess exit codes, SURVEY.md
§5.3); our CLI reports the instance failure explicitly.
"""

from fractions import Fraction

import numpy as np
import pytest

from otti_tpu.io import sdpa
from otti_tpu.oracle import sdp_infeas

TRUSS1 = "/root/reference/datasets/SDP/full/truss1.dat-s"


def test_truss1_dual_infeasibility_certificate_exact():
    prob = sdpa.parse_dats(TRUSS1)
    X = sdp_infeas.find_certificate(prob)
    assert X is not None, "no Farkas candidate found"
    res = sdp_infeas.check_certificate(prob, X)
    # every check below is exact rational arithmetic — no tolerances
    assert res["psd"], "witness X is not PSD"
    assert res["orthogonal"], "<A_i, X> != 0 for some i"
    assert res["objective"] < 0, "<C, X> not negative"
    assert res["refutes"]
    # quantitative: max over ALL y of lambda_min(C - sum y_i A_i) is at
    # most <C,X>/tr(X); for truss1 the bound comes out exactly -1/2
    assert res["lambda_min_bound"] <= Fraction(-1, 4)


def test_psd_exact_oracle():
    """The exact PSD checker agrees with numpy on simple cases."""
    F = Fraction
    assert sdp_infeas.is_psd_exact([[F(2), F(1)], [F(1), F(2)]])
    assert not sdp_infeas.is_psd_exact([[F(1), F(2)], [F(2), F(1)]])
    assert sdp_infeas.is_psd_exact([[F(0), F(0)], [F(0), F(1)]])
    assert not sdp_infeas.is_psd_exact([[F(0), F(1)], [F(1), F(1)]])
    assert sdp_infeas.is_psd_exact([[F(0), F(0)], [F(0), F(0)]])


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
