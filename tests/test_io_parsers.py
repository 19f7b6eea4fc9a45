"""Parser coverage across the complete reference dataset corpus."""

import glob
import os

import numpy as np
import pytest

from otti_tpu.io import mps, sdpa

LP_FULL = sorted(glob.glob("/root/reference/datasets/LP/MPS-full/*.mps"))
SDP_FULL = sorted(glob.glob("/root/reference/datasets/SDP/full/*.dat-s"))


@pytest.mark.skipif(not LP_FULL, reason="reference datasets not mounted")
def test_parse_all_netlib_instances():
    assert len(LP_FULL) == 28
    for path in LP_FULL:
        p = mps.parse_mps(path)
        assert p.n_rows > 0 and p.n_vars > 0, path
        assert p.A.shape == (p.n_rows, p.n_vars)
        assert len(p.row_senses) == p.n_rows
        assert set(p.row_senses) <= {"E", "L", "G"}, path
        assert np.isfinite(p.A).all() and np.isfinite(p.rhs).all(), path


@pytest.mark.skipif(not SDP_FULL, reason="reference datasets not mounted")
def test_parse_all_sdplib_instances():
    assert len(SDP_FULL) == 11
    for path in SDP_FULL:
        p = sdpa.parse_dats(path)
        assert p.n > 0 and p.m > 0, path
        assert p.C.shape == (p.n, p.n)
        assert len(p.A) == p.m and p.b.shape == (p.m,)
        assert np.allclose(p.C, p.C.T), path
        for Ai in p.A:
            assert np.allclose(Ai, Ai.T), path


def test_bounds_instance_modszk1():
    """The only BOUNDS-carrying Netlib instance in the corpus."""
    p = mps.parse_mps("/root/reference/datasets/LP/MPS-full/modszk1.mps")
    assert p.bounds, "modszk1 must have explicit bounds"
    sb = mps.scipy_bounds(p)
    assert len(sb) == p.n_vars


def test_sgd_configs_match_reference():
    from otti_tpu.io import pmlb_local

    for name, n_expected in (
        ("pmlb-small.json", 5),
        ("pmlb-full.json", 16),
        ("pmlb-prob.json", 2),
    ):
        cfg = pmlb_local.load_config(
            os.path.join("/root/reference/datasets/SGD", name)
        )
        assert len(cfg) == n_expected
        for params in cfg.values():
            assert len(params["classes"]) == 2
            assert {"seed", "eta0", "maxiter", "tol"} <= set(params)
