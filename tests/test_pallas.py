"""Pallas fused field-mul kernel vs the XLA path (interpreter mode on CPU)."""

import random

import jax.numpy as jnp
import pytest

from otti_tpu.field import fields, ops as F
from otti_tpu.field.fields import BASE, SCALAR
from otti_tpu.field import pallas_kernels as PK


@pytest.mark.parametrize("spec", [SCALAR, BASE], ids=lambda s: s.name)
def test_pallas_mul_matches(spec):
    r = random.Random(11)
    xs = [r.randrange(spec.modulus) for _ in range(10)] + [0, 1, spec.modulus - 1]
    ys = [r.randrange(spec.modulus) for _ in range(10)] + [spec.modulus - 1, 2, 1]
    a = jnp.asarray(fields.ints_to_limbs(xs))
    b = jnp.asarray(fields.ints_to_limbs(ys))
    got = PK.mul_pallas(spec, a, b, interpret=True)
    want = [(x * y) % spec.modulus for x, y in zip(xs, ys)]
    assert fields.limbs_to_ints(F.canon_jit(spec)(got)) == want
