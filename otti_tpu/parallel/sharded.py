"""Multi-chip sharding of the prover's hot loops (SURVEY.md §2.3, §5.7-8).

The reference scales by "buy 200GB of RAM" (README.md:39-42); here the
R1CS evaluation hypercube, the MSM point set, and independent instances
shard across a ``jax.sharding.Mesh``:

  axis "dp" — data parallel: independent instances proved concurrently
              (batched proving, BASELINE.json configs[4]);
  axis "sp" — sequence-parallel analog: the 2^mu sumcheck/MSM element
              axis (SURVEY.md §5.7: sharding the evaluation hypercube is
              the ring/Ulysses-style decomposition of this workload).

Collective pattern per sumcheck round: all compute is shard-local (the
tables are laid out so variable binding pairs adjacent elements — we bind
LSB-first here, a protocol-level convention flag) plus one psum of three
scalars for the round evaluations.  MSM: each sp-shard reduces its point
range to one partial group element; partials are combined with a tiny
tree-add (log k batched point additions).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..curve import edwards as E
from ..field import ops as F
from ..field.fields import SCALAR
from ..msm import pippenger


def make_mesh(n_devices: int | None = None, dp: int = 1):
    devs = jax.devices()
    n = n_devices or len(devs)
    sp = n // dp
    import numpy as np

    return Mesh(np.asarray(devs[:n]).reshape(dp, sp), ("dp", "sp"))


# ---------------------------------------------------------------------------
# Sharded sumcheck round (cubic, phase-1 shape)
# ---------------------------------------------------------------------------

def _ext_lsb(tbl: jax.Array, t: int) -> jax.Array:
    """Bind the LSB variable at X=t: pairs (2j, 2j+1) -> lo + t*(hi-lo)."""
    lo = tbl[0::2]
    hi = tbl[1::2]
    if t == 0:
        return lo
    d = F.sub(SCALAR, hi, lo)
    return F.add(SCALAR, lo, F.mul_small(SCALAR, d, t))


def round_cubic_sharded(mesh: Mesh, eq, pa, pb, pc):
    """One sumcheck round over sp-sharded tables [n, L].

    Returns ((e0, e2, e3) replicated scalars, local-bound tables ready for
    the next round after the challenge arrives via ``bind_sharded``).
    All table math is shard-local; one psum(3 scalars) over "sp".
    """

    def kernel(eq_l, pa_l, pb_l, pc_l):
        outs = []
        for t in (0, 2, 3):
            eqt, at, bt, ct = (_ext_lsb(x, t) for x in (eq_l, pa_l, pb_l, pc_l))
            w = F.sub(SCALAR, F.mul(SCALAR, at, bt), ct)
            part = F.dot(SCALAR, eqt, w)
            outs.append(jax.lax.psum(part, "sp"))
        return tuple(outs)

    spec = P("sp", None)
    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(P(), P(), P()),
    )(eq, pa, pb, pc)


def bind_sharded(mesh: Mesh, r, *tables):
    """Bind the LSB variable to challenge r on every sp-shard locally."""

    def kernel(r_l, *tbls):
        out = []
        for tbl in tbls:
            lo, hi = tbl[0::2], tbl[1::2]
            out.append(
                F.add(SCALAR, lo, F.mul_scalar(SCALAR, F.sub(SCALAR, hi, lo), r_l))
            )
        return tuple(out)

    spec = P("sp", None)
    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(None),) + (spec,) * len(tables),
        out_specs=(spec,) * len(tables),
    )(r, *tables)


# ---------------------------------------------------------------------------
# Sharded MSM
# ---------------------------------------------------------------------------

def msm_sharded(mesh: Mesh, points, scalars, window: int = 4):
    """Pippenger with the point range sharded over "sp".

    Each shard runs the full windowed bucket algorithm on its local range
    and emits one partial point; the k partials are tree-added (log k
    batched adds).  This is exactly BASELINE.json's "Pippenger MSM
    partitions points across a pod slice" with the bucket reduction local
    and only O(1) group elements crossing ICI.
    """

    def kernel(pts_l, sc_l):
        part = pippenger.msm(pts_l, sc_l, window=window)
        return jax.tree.map(lambda a: a[None], part)

    pt_spec = {k: P("sp", None) for k in ("x", "y", "z", "t")}
    partials = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(pt_spec, P("sp", None)),
        out_specs={k: P("sp", None) for k in ("x", "y", "z", "t")},
    )(points, scalars)
    return E.sum_points(partials)


# ---------------------------------------------------------------------------
# Sharded sparse matvec (Az/Bz/Cz with nonzeros partitioned over sp)
# ---------------------------------------------------------------------------

def matvec_sharded(mesh: Mesh, rows, cols, vals, z, num_cons: int):
    """rows/cols/vals sharded over "sp"; z replicated.  Local gather +
    field-mul + segment-sum, then one psum of the [num_cons, L] result."""

    def kernel(rows_l, cols_l, vals_l, z_l):
        prods = F.mul(SCALAR, vals_l, z_l[cols_l])
        acc = jax.ops.segment_sum(prods, rows_l, num_segments=num_cons)
        return jax.lax.psum(acc, "sp")

    out = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("sp"), P("sp"), P("sp", None), P(None, None)),
        out_specs=P(None, None),
    )(rows, cols, vals, z)
    return F.reduce_wide(SCALAR, out)
