"""R1CS instance representation + device kernels for the Spartan prover.

Mirrors the *role* of Spartan's ``Instance``/``R1CSShape`` (SURVEY.md §1
L1 row; §3.5) with a TPU-native layout: the three sparse matrices live as
structure-of-arrays COO (int32 row/col indices + limb-vector values), and
every hot operation — A·z / B·z / C·z, the phase-2 combined-matrix table,
and the verifier's \tilde{A}(rx, ry) evaluations — is a gather + batched
field-mul + segment-sum.  Field addition is linear in the limbs, so the
segment reduction is a plain int32 ``segment_sum`` with one deferred
modular reduction — no atomics, no sorting, exactly what XLA scatter
lowering wants.

z layout (Spartan convention): z = (vars | 1 | inputs | 0-pad), with
``num_vars`` padded to a power of two and the io segment padded to the
same length, so len(z) = 2 * num_vars_padded and the MLE of z has
log2(2*num_vars_padded) variables whose top bit selects the io half.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ops as F
from ..field.fields import N_LIMBS as N_LIMB_COUNT, SCALAR, ints_to_limbs


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


@dataclasses.dataclass
class R1CSShape:
    """Host-side canonical R1CS over the ristretto255 scalar field.

    Entries are (row, col, value:int) with col indexing the z layout
    above: cols [0, num_vars) hit witness vars, col num_vars_padded is the
    constant 1, cols (num_vars_padded, num_vars_padded+num_inputs] the
    public inputs.  Builders use logical col indices (vars then 1 then
    inputs) and ``from_logical`` rewires them to the padded layout.
    """

    num_cons: int
    num_vars: int
    num_inputs: int
    A: list  # [(row, col, int)]
    B: list
    C: list

    @property
    def num_vars_padded(self) -> int:
        return max(_next_pow2(self.num_vars), _next_pow2(self.num_inputs + 1))

    @property
    def num_cons_padded(self) -> int:
        return _next_pow2(self.num_cons)

    @staticmethod
    def from_logical(num_cons, num_vars, num_inputs, A, B, C) -> "R1CSShape":
        """Build from logical col indices: 0..num_vars-1 = witness vars,
        num_vars = constant one, num_vars+1+i = input i."""
        shape = R1CSShape(num_cons, num_vars, num_inputs, [], [], [])
        npad = shape.num_vars_padded

        def rewire(entries):
            out = []
            for r, c, v in entries:
                v %= SCALAR.modulus
                if v == 0:
                    continue
                if c < num_vars:
                    out.append((r, c, v))
                else:  # constant-1 column or input column
                    out.append((r, npad + (c - num_vars), v))
            return out

        shape.A, shape.B, shape.C = rewire(A), rewire(B), rewire(C)
        return shape

    def digest(self) -> bytes:
        """Canonical SHA3-256 digest binding the instance into transcripts.

        Uses hashlib's C implementation (the pure-python keccak in
        transcript/ is for STROBE, where we control the sponge framing).
        """
        import hashlib

        h = bytearray()
        for tag, mat in ((b"A", self.A), (b"B", self.B), (b"C", self.C)):
            h += tag + len(mat).to_bytes(8, "little")
            for r, c, v in sorted(mat):
                h += r.to_bytes(8, "little") + c.to_bytes(8, "little")
                h += (v % SCALAR.modulus).to_bytes(32, "little")
        meta = (
            self.num_cons.to_bytes(8, "little")
            + self.num_vars.to_bytes(8, "little")
            + self.num_inputs.to_bytes(8, "little")
        )
        return hashlib.sha3_256(bytes(meta + h)).digest()

    def to_device(self, min_cons: int = 1, min_vars: int = 1) -> "R1CSDevice":
        """``min_cons``/``min_vars`` force larger power-of-two padding so
        heterogeneous instances can share one batched prover program
        (spartan/batched.py)."""
        nvp = max(self.num_vars_padded, _next_pow2(min_vars))
        ncp = max(self.num_cons_padded, _next_pow2(min_cons))
        nzpad = 2 * nvp
        old_npad = self.num_vars_padded

        def remap_col(c: int) -> int:
            # entries were rewired against the natural padding; shift the
            # io half (constant-one + inputs) if a larger padding is forced
            return c if c < old_npad else nvp + (c - old_npad)

        # ALL THREE matrices share one padded nnz: the matvec/mtw/eval
        # kernels retrace per input shape, and a uniform pad collapses the
        # (nnzA, nnzB, nnzC) triple into one bucket — 15 -> 6 distinct
        # kernel shapes over the Netlib-LP full suite, each executable
        # load costing ~10-60 s per process on the tunnel (r03)
        nnz_uniform = max(
            _next_pow2(max(len(m), 1)) for m in (self.A, self.B, self.C)
        )

        def pack(mat):
            if not mat:
                mat = [(0, 0, 0)]
            nnz = len(mat)
            nnz_pad = nnz_uniform
            rows = np.zeros(nnz_pad, np.int32)
            cols = np.zeros(nnz_pad, np.int32)
            rows[:nnz] = [e[0] for e in mat]
            cols[:nnz] = [remap_col(e[1]) for e in mat]
            vals = np.zeros((nnz_pad, N_LIMB_COUNT), np.int32)
            vals[:nnz] = ints_to_limbs([e[2] for e in mat])
            return (
                jnp.asarray(rows),
                jnp.asarray(cols),
                jnp.asarray(vals),
            )

        return R1CSDevice(
            num_cons=ncp,
            num_z=nzpad,
            num_vars=nvp,
            num_inputs=self.num_inputs,
            mats=tuple(pack(m) for m in (self.A, self.B, self.C)),
            digest=self.digest(),
        )

    # -- host-side satisfiability check (test oracle) ----------------------
    def is_satisfied(self, vars_ints, inputs_ints) -> bool:
        m = SCALAR.modulus
        z = list(vars_ints) + [0] * (self.num_vars_padded - self.num_vars)
        z += [1] + list(inputs_ints)
        z += [0] * (2 * self.num_vars_padded - len(z))
        def rowvals(mat):  # one O(nnz) pass, not O(cons * nnz)
            acc = [0] * self.num_cons
            for r, c, v in mat:
                acc[r] = (acc[r] + v * z[c]) % m
            return acc

        az, bz, cz = rowvals(self.A), rowvals(self.B), rowvals(self.C)
        return all(a * b % m == c for a, b, c in zip(az, bz, cz))


@dataclasses.dataclass
class R1CSDevice:
    """Device-resident padded R1CS (static-shape COO).

    The heavy operations are exposed as per-instance cached jitted
    callables (eager dispatch is prohibitively slow in this environment
    and the shapes are instance-static anyway).
    """

    num_cons: int  # padded
    num_z: int  # 2 * num_vars_padded
    num_vars: int  # padded
    num_inputs: int
    mats: tuple  # ((rows, cols, vals) for A, B, C)
    digest: bytes

    def matvec(self, which: int, z: jax.Array) -> jax.Array:
        """M @ z for M in {A,B,C}: [num_z, L] -> [num_cons, L]."""
        return self.matvecs(z)[which]

    def _flat_mats(self):
        return tuple(x for m in range(3) for x in self.mats[m])

    def matvecs(self, z: jax.Array) -> tuple:
        """(Az, Bz, Cz) in one jitted call (kernels are module-level and
        keyed by shape, so equal-size instances share the compilation)."""
        return _matvecs_jit(self.num_cons)(z, *self._flat_mats())

    def matvec_T_weighted(self, weights: tuple, e_rx: jax.Array) -> jax.Array:
        """Phase-2 table: M(y) = sum_m w_m * sum_{(r,c,v) in M_m} e_rx[r]*v
        scattered into column y.  weights: 3 limb vectors [L]."""
        return _mtw_jit(self.num_z)(weights, e_rx, *self._flat_mats())

    def eval_at(self, e_rx: jax.Array, e_ry: jax.Array) -> tuple:
        """( \tilde A(rx,ry), \tilde B, \tilde C ) given eq tables of rx, ry."""
        return _eval_jit()(e_rx, e_ry, *self._flat_mats())


import functools


@functools.lru_cache(maxsize=None)
def _matvecs_jit(num_cons: int):
    def impl(z, *flat):
        outs = []
        for m in range(3):
            rows, cols, vals = flat[3 * m : 3 * m + 3]
            prods = F.mul(SCALAR, vals, z[cols])
            acc = jax.ops.segment_sum(prods, rows, num_segments=num_cons)
            outs.append(F.reduce_wide(SCALAR, acc))
        return tuple(outs)

    return jax.jit(impl)


@functools.lru_cache(maxsize=None)
def _mtw_jit(num_z: int):
    def impl(weights, e_rx, *flat):
        acc = None
        for m in range(3):
            rows, cols, vals = flat[3 * m : 3 * m + 3]
            prods = F.mul(
                SCALAR, F.mul(SCALAR, vals, e_rx[rows]), weights[m][None, :]
            )
            part = jax.ops.segment_sum(prods, cols, num_segments=num_z)
            part = F.reduce_wide(SCALAR, part)
            acc = part if acc is None else F.add(SCALAR, acc, part)
        return acc

    return jax.jit(impl)


@functools.lru_cache(maxsize=None)
def _eval_jit():
    def impl(e_rx, e_ry, *flat):
        outs = []
        for m in range(3):
            rows, cols, vals = flat[3 * m : 3 * m + 3]
            prods = F.mul(SCALAR, F.mul(SCALAR, vals, e_rx[rows]), e_ry[cols])
            outs.append(F.sum_reduce(SCALAR, prods, axis=0))
        return tuple(outs)

    return jax.jit(impl)


def assemble_z(
    vars_limbs: jax.Array, inputs_limbs: jax.Array, num_vars_padded: int
) -> jax.Array:
    """(vars | 1 | inputs | 0) -> [2*num_vars_padded, L]."""
    nv = vars_limbs.shape[0]
    ni = inputs_limbs.shape[0] if inputs_limbs is not None else 0
    parts = [vars_limbs]
    if nv < num_vars_padded:
        parts.append(jnp.zeros((num_vars_padded - nv, vars_limbs.shape[-1]), jnp.int32))
    parts.append(F.ones(SCALAR, (1,)))
    if ni:
        parts.append(inputs_limbs)
    pad = 2 * num_vars_padded - (num_vars_padded + 1 + ni)
    if pad:
        parts.append(jnp.zeros((pad, vars_limbs.shape[-1]), jnp.int32))
    return jnp.concatenate(parts, axis=0)
