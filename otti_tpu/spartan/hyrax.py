"""Hyrax polynomial-commitment openings (batched, RLC-combined).

Factored out of nizk.py for reuse by the SPARK sparse-commitment layer
(SURVEY.md §3.5 "dense-polynomial opening proof"): several committed
polynomials over the SAME hypercube, all evaluated at the SAME point,
open through one random-linear-combination — one u-vector, one pair of
host MSM checks.

Plain (non-hiding) flavor: blinds zero, the row-combination vector u is
revealed.  The ZK flavor lives in zknizk.py (DotProductProof).
"""

from __future__ import annotations

import jax

from ..field import ops as F
from ..field.fields import SCALAR
from ..native import msm_host, ristretto_decode_host
from ..refimpl import numeric as ref
from . import commitments, mle

L_ORD = ref.L


def hyrax_dims(n: int):
    """Number of variables -> (mu_rows, mu_cols) with cols >= rows."""
    mu = (n - 1).bit_length() if n > 1 else 0
    mu_cols = (mu + 1) // 2
    return mu - mu_cols, mu_cols


def commit_poly(poly_dev: jax.Array, label: bytes) -> list:
    """[2^mu, L] dense MLE -> list of row-commitment encodings (blind 0)."""
    n = poly_dev.shape[0]
    mu_rows, mu_cols = hyrax_dims(n)
    W = poly_dev.reshape(1 << mu_rows, 1 << mu_cols, -1)
    pts = commitments.commit_rows(W, [0] * (1 << mu_rows), label)
    return commitments.encode_points(pts)


def open_rlc(polys_dev: list, weights: list, point: list) -> list:
    """u-vector opening the RLC of ``polys_dev`` at ``point``.

    u[c] = sum_r eq_L[r] * Q[r, c] with Q = sum_k w_k P_k.
    """
    n = polys_dev[0].shape[0]
    mu_rows, mu_cols = hyrax_dims(n)
    from .nizk import _dev_vec, _row_combine_jit

    q = None
    for w, p in zip(weights, polys_dev):
        term = F.mul(SCALAR, F.const(SCALAR, w % L_ORD, ()), p)
        q = term if q is None else F.add(SCALAR, q, term)
    Q = q.reshape(1 << mu_rows, 1 << mu_cols, -1)
    eq_L = (
        mle.eq_table(_dev_vec(point[:mu_rows]))
        if mu_rows
        else F.ones(SCALAR, (1,))
    )
    u = _row_combine_jit((1 << mu_rows, 1 << mu_cols))(eq_L, Q)
    return [int(v) for v in F.pack_ints(SCALAR, u)]


def verify_rlc(
    comm_lists: list,
    weights: list,
    point: list,
    claimed_vals: list,
    u_ints: list,
    label: bytes,
) -> bool:
    """Check the RLC opening: (a) sum_i L_i C_i == commit(u); (b)
    <u, eq_R(point)> == sum_k w_k * claimed_k."""
    from .zknizk import _eq_weights

    n_rows = len(comm_lists[0])
    mu_rows = (n_rows - 1).bit_length() if n_rows > 1 else 0
    # combine commitments row-wise
    combined = []
    for i in range(n_rows):
        pts = [ristretto_decode_host(cl[i]) for cl in comm_lists]
        if any(p is None for p in pts):
            return False
        combined.append(msm_host(pts, [w % L_ORD for w in weights]))
    Lw = _eq_weights(point[:mu_rows])
    lhs = msm_host(combined, Lw)
    G, _ = commitments.gen_points_host(len(u_ints), label)
    rhs = msm_host(list(G), list(u_ints))
    if not lhs.ristretto_eq(rhs):
        return False
    Rw = _eq_weights(point[mu_rows:])
    ip = sum(u * r for u, r in zip(u_ints, Rw)) % L_ORD
    want = sum(w * v for w, v in zip(weights, claimed_vals)) % L_ORD
    return ip == want


def open_rlc_bullet(polys_dev: list, weights: list, point: list, t, label: bytes):
    """Log-sized RLC opening: instead of REVEALING the u-vector
    (32 B x 2^mu_cols on the wire — 14 KB of the r04 SNARK proof), prove
    <u, eq_R(point)> = sum_k w_k*claim_k with the same transparent bullet
    argument the base NIZK opening uses (r05; VERDICT r04 next #4 size
    target).  The verifier derives the u-commitment itself from the row
    commitments, so only 2*log2(cols)+3 group elements go on the wire."""
    from . import bullet
    from .zknizk import _eq_weights

    u_ints = open_rlc(polys_dev, weights, point)
    n = polys_dev[0].shape[0]
    mu_rows, mu_cols = hyrax_dims(n)
    R = _eq_weights(point[mu_rows:])
    G, H = commitments.gen_points_host(1 << mu_cols, label)
    Q = bullet.q_point_host(label)
    return bullet.prove(t, list(G), H, Q, u_ints, R, 0, rng=None)


def verify_rlc_bullet(
    comm_lists: list,
    weights: list,
    point: list,
    claimed_vals: list,
    proof,
    label: bytes,
    t,
) -> bool:
    """Verify a bullet RLC opening: C_u = sum_i L_i * (sum_k w_k C_k[i]);
    P = C_u + (sum_k w_k claim_k)*Q; bullet-check <u, eq_R> against P."""
    from ..native import msm_host, ristretto_decode_host
    from . import bullet
    from .zknizk import _eq_weights

    n_rows = len(comm_lists[0])
    mu_rows = (n_rows - 1).bit_length() if n_rows > 1 else 0
    combined = []
    for i in range(n_rows):
        pts = [ristretto_decode_host(cl[i]) for cl in comm_lists]
        if any(p is None for p in pts):
            return False
        combined.append(msm_host(pts, [w % L_ORD for w in weights]))
    Lw = _eq_weights(point[:mu_rows])
    R = _eq_weights(point[mu_rows:])
    want = sum(w * v for w, v in zip(weights, claimed_vals)) % L_ORD
    G, H = commitments.gen_points_host(len(R), label)
    Q = bullet.q_point_host(label)
    P = msm_host(combined + [Q], Lw + [want])
    return bullet.verify(t, list(G), H, Q, R, P, proof)


_eval_jit_cache: dict = {}


def eval_poly_host(poly_dev: jax.Array, point: list) -> int:
    """Direct MLE evaluation on device, fetched to host (prover side)."""
    from .nizk import _dev_vec

    key = (poly_dev.shape[0], len(point))
    if key not in _eval_jit_cache:
        _eval_jit_cache[key] = jax.jit(
            lambda p, r: F.canon(SCALAR, mle.evaluate(p, r))
        )
    val = _eval_jit_cache[key](poly_dev, _dev_vec(point))
    return int(F.pack_ints(SCALAR, val))
