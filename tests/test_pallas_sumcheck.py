"""Fused Pallas sumcheck-round kernel vs the XLA step kernel.

The kernel was validated bit-for-bit against sumcheck._step_cubic_kernel
ON THE REAL TPU (evals + bound-table agreement at n=4096, ah in
{2048, 1024}; see the measured record in spartan/pallas_sumcheck.py).
Pallas interpret mode takes >25 min to trace this kernel's unrolled
field arithmetic on CPU, so the CPU suite only checks the module's
host-side plumbing; set OTTI_PALLAS_TEST=1 (with a TPU or patience) to
run the full cross-check.
"""

import os
import random

import jax.numpy as jnp
import numpy as np
import pytest

from otti_tpu.field import ops as F
from otti_tpu.field.fields import SCALAR, ints_to_limbs
from otti_tpu.spartan import pallas_sumcheck, sumcheck

MOD = SCALAR.modulus


def _tables(n, seed=0):
    r = random.Random(seed)
    return [
        jnp.asarray(ints_to_limbs([r.randrange(MOD) for _ in range(n)]))
        for _ in range(4)
    ]


def test_module_constants():
    # 2m limb decomposition used by the in-kernel subtract
    total = sum(v << (12 * i) for i, v in enumerate(pallas_sumcheck._TWO_M))
    assert total == 2 * MOD
    assert pallas_sumcheck.CHUNK % 128 == 0


@pytest.mark.skipif(
    not os.environ.get("OTTI_PALLAS_TEST"),
    reason="pallas interpret mode is prohibitively slow on CPU; "
    "kernel is validated on the real TPU (see module docstring)",
)
@pytest.mark.parametrize("n,ah", [(4096, 2048), (4096, 1024)])
def test_step_matches_xla(n, ah):
    eq, pa, pb, pc = _tables(n, seed=n + ah)
    r_prev = jnp.asarray(ints_to_limbs([0x123456789ABCDEF]))[0]

    evals_x, tables_x = sumcheck._step_cubic_kernel(n)(
        r_prev, jnp.int32(ah), eq, pa, pb, pc
    )
    evals_x = [int(v) for v in F.pack_ints(SCALAR, evals_x)]

    lm = lambda t: jnp.moveaxis(t, -1, 0)  # [n, L] -> [L, n]
    import jax

    interpret = jax.devices()[0].platform == "cpu"
    evals_p, bound_p = pallas_sumcheck.step_cubic_pallas(
        r_prev, ah, lm(eq), lm(pa), lm(pb), lm(pc), interpret=interpret
    )
    evals_p = [int(v) for v in F.pack_ints(SCALAR, evals_p)]
    assert evals_p == evals_x

    for bx, bp in zip(tables_x, bound_p):
        a = np.asarray(F.pack_ints(SCALAR, bx[:ah]))
        b = np.asarray(F.pack_ints(SCALAR, jnp.moveaxis(bp, 0, -1)[:ah]))
        assert (a == b).all()
