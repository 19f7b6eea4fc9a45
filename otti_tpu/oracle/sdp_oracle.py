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


def solve(prob: SDPProblem, tol: float = 1e-7, max_iter: int = 300):
    """-> (X, y, S) primal/dual optimal with <X,S> ~= 0.

    Mehrotra predictor-corrector on the HKM direction: the affine step
    sets sigma = (mu_aff/mu)^3 and the corrector folds in the
    -dX_aff dS_aff S^{-1} second-order term.  Stopping is
    certificate-aware: the Otti statement only needs epsilon=1e-2-scaled
    feasibility/complementarity (SURVEY.md §3.2), so a stall slightly
    above ``tol`` still yields a valid witness.
    """
    n, m = prob.n, prob.m
    A, b, C = prob.A, prob.b, prob.C
    scale = max(1.0, float(np.abs(C).max()), float(np.abs(b).max() if m else 1.0))
    X = np.eye(n) * scale
    S = np.eye(n) * scale
    y = np.zeros(m)
    best = None

    def residuals(X, y, S):
        rp = b - np.asarray([(Ai * X).sum() for Ai in A])
        Rd = C - S - sum(yi * Ai for yi, Ai in zip(y, A))
        return rp, Rd

    def rel_err(X, y, S):
        rp, Rd = residuals(X, y, S)
        gap = abs((X * S).sum())
        return max(
            np.abs(rp).max() / (1 + (np.abs(b).max() if m else 1.0)),
            np.abs(Rd).max() / (1 + np.abs(C).max()),
            gap / (1 + abs((C * X).sum())),
        )

    for it in range(max_iter):
        rp, Rd = residuals(X, y, S)
        mu = (X * S).sum() / n
        err = rel_err(X, y, S)
        if best is None or err < best[0]:
            best = (err, X.copy(), y.copy(), S.copy())
        if err < tol:
            break
        Ssym = 0.5 * (S + S.T)
        try:
            Sinv = np.linalg.inv(Ssym)
        except np.linalg.LinAlgError:
            Sinv = np.linalg.pinv(Ssym + 1e-12 * np.trace(Ssym) / n * np.eye(n))
        XAS = [X @ Ai @ Sinv for Ai in A]
        M = np.empty((m, m))
        for i in range(m):
            for j in range(m):
                M[i, j] = (A[i] * XAS[j]).sum()
        M = 0.5 * (M + M.T) + 1e-13 * max(np.trace(M) / max(m, 1), 1.0) * np.eye(m)

        def solve_dir(sigma_mu, corr):
            XRdS = X @ Rd @ Sinv
            corrS = corr @ Sinv
            rhs = np.asarray(
                [
                    b[i]
                    - sigma_mu * (A[i] * Sinv).sum()
                    + (A[i] * XRdS).sum()
                    + (A[i] * corrS).sum()
                    for i in range(m)
                ]
            )
            try:
                dy = np.linalg.solve(M, rhs)
            except np.linalg.LinAlgError:
                dy = np.linalg.lstsq(M, rhs, rcond=None)[0]
            dS = Rd - sum(dyi * Ai for dyi, Ai in zip(dy, A))
            dX = sigma_mu * Sinv - X - X @ dS @ Sinv - corrS
            return 0.5 * (dX + dX.T), dy, dS

        # predictor (affine scaling)
        dXa, dya, dSa = solve_dir(0.0, np.zeros((n, n)))
        ap_a = _max_step(X, dXa)
        ad_a = _max_step(S, dSa)
        mu_aff = ((X + ap_a * dXa) * (S + ad_a * dSa)).sum() / n
        sigma = min(1.0, max(0.0, mu_aff / mu) ** 3) if mu > 0 else 0.1
        # corrector with the Mehrotra second-order term
        dX, dy, dS = solve_dir(sigma * mu, dXa @ dSa)
        ap = _max_step(X, dX)
        ad = _max_step(S, dS)
        if ap < 1e-10 and ad < 1e-10:
            break
        X = X + ap * dX
        S = S + ad * dS
        y = y + ad * dy

    err_now = rel_err(X, y, S)
    if best is not None and best[0] < err_now:
        err_now, X, y, S = best
    rp, Rd = residuals(X, y, S)
    gap = abs((X * S).sum())
    # certificate-aware acceptance: the in-circuit checks use absolute
    # epsilon=1e-2 at instance scale; 1e-3 relative is ample headroom.
    if err_now > 1e-3:
        raise RuntimeError(
            f"SDP oracle did not converge on {prob.name}: "
            f"rel={err_now:.2e} gap={gap:.2e} rp={np.abs(rp).max():.2e} "
            f"rd={np.abs(Rd).max():.2e}"
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
