"""SDP witness oracle: primal-dual interior-point solver (HKM direction).

Replaces the reference's CSDP 6.2.0 binary `__GADGET_sdp` oracle — whose
blob is stripped from the snapshot (SURVEY.md §0.1) — with a self-contained
numpy implementation adequate for the SDPLIB instances (n <= ~50).  As
with all Otti oracles, the solver runs outside the proof; the R1CS checks
the certificate (A_i.X = b_i, Cholesky-witnessed PSD of X and the dual
slack S, complementary slackness <S, X> ~ 0; SURVEY.md §3.2).

Standard primal-dual central-path Newton steps with the HKM direction:
    <A_i, DX> = rp_i,   sum_i Dy_i A_i + DS = Rd,   DX S + X DS = sigma*mu*I - X S
Schur complement  M_ij = <A_i, X A_j S^{-1}>  solved densely per iteration.
"""

from __future__ import annotations

import numpy as np

from ..io.sdpa import SDPProblem


def _is_pd(M: np.ndarray) -> bool:
    try:
        np.linalg.cholesky(M)
        return True
    except np.linalg.LinAlgError:
        return False


def _max_step(M: np.ndarray, dM: np.ndarray, tau: float = 0.98) -> float:
    """Largest alpha in (0, 1] with M + alpha*dM positive definite."""
    alpha = 1.0
    for _ in range(40):
        if _is_pd(M + alpha * dM):
            return alpha
        alpha *= 0.7
    return 0.0


def solve(prob: SDPProblem, tol: float = 1e-7, max_iter: int = 200):
    """-> (X, y, S) primal/dual optimal with <X,S> ~= 0."""
    n, m = prob.n, prob.m
    A, b, C = prob.A, prob.b, prob.C
    scale = max(1.0, float(np.abs(C).max()), float(np.abs(b).max()))
    X = np.eye(n) * scale
    S = np.eye(n) * scale
    y = np.zeros(m)

    for it in range(max_iter):
        rp = b - np.asarray([(Ai * X).sum() for Ai in A])
        Rd = C - S - sum(yi * Ai for yi, Ai in zip(y, A))
        mu = (X * S).sum() / n
        err = max(
            np.abs(rp).max() / (1 + np.abs(b).max()),
            np.abs(Rd).max() / (1 + np.abs(C).max()),
            abs(mu) / (1 + abs((C * X).sum())),
        )
        if err < tol:
            break
        sigma = 0.25 if err > 10 * tol else 0.1
        Sinv = np.linalg.inv(S)
        XAS = [X @ Ai @ Sinv for Ai in A]
        M = np.empty((m, m))
        for i in range(m):
            for j in range(m):
                M[i, j] = (A[i] * XAS[j]).sum()
        M = 0.5 * (M + M.T) + 1e-12 * np.eye(m)
        XRdS = X @ Rd @ Sinv
        rhs = np.asarray(
            [
                b[i] - sigma * mu * (A[i] * Sinv).sum() + (A[i] * XRdS).sum()
                for i in range(m)
            ]
        )
        try:
            dy = np.linalg.solve(M, rhs)
        except np.linalg.LinAlgError:
            dy = np.linalg.lstsq(M, rhs, rcond=None)[0]
        dS = Rd - sum(dyi * Ai for dyi, Ai in zip(dy, A))
        dX = sigma * mu * Sinv - X - X @ dS @ Sinv
        dX = 0.5 * (dX + dX.T)
        ap = _max_step(X, dX)
        ad = _max_step(S, dS)
        if ap == 0.0 and ad == 0.0:
            break
        X = X + ap * dX
        S = S + ad * dS
        y = y + ad * dy

    gap = abs((X * S).sum())
    rp = np.abs(b - np.asarray([(Ai * X).sum() for Ai in A])).max()
    rd = np.abs(C - S - sum(yi * Ai for yi, Ai in zip(y, A))).max()
    if max(gap / (1 + abs((C * X).sum())), rp / (1 + np.abs(b).max() if b.size else 1)) > 1e-4:
        raise RuntimeError(
            f"SDP oracle did not converge on {prob.name}: gap={gap:.2e} rp={rp:.2e} rd={rd:.2e}"
        )
    return X, y, S


def cholesky_witness(M: np.ndarray) -> np.ndarray:
    """Lower-triangular L with L L^T ~= M (PSD witness, jittered)."""
    n = M.shape[0]
    for jitter in (0.0, 1e-12, 1e-10, 1e-8, 1e-6):
        try:
            return np.linalg.cholesky(M + jitter * np.eye(n))
        except np.linalg.LinAlgError:
            continue
    # eigen-clip fallback
    w, V = np.linalg.eigh(0.5 * (M + M.T))
    w = np.clip(w, 0.0, None)
    return np.linalg.cholesky(V @ np.diag(w) @ V.T + 1e-8 * np.eye(n))
