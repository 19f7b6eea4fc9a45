"""Field-arithmetic kernels vs. big-int oracle (SURVEY.md §7.2 step 1).

Everything runs under jit: per-op eager dispatch is prohibitively slow in
this environment, and the production stack is always jit-compiled anyway.
"""

import functools
import random

import jax
import numpy as np
import pytest

from otti_tpu.field import fields, ops
from otti_tpu.field.fields import BASE, SCALAR

SPECS = [SCALAR, BASE]


@functools.lru_cache(maxsize=None)
def J(spec, name):
    """Cached jitted wrapper producing canonical limbs."""
    fns = {
        "add": lambda a, b: ops.canon(spec, ops.add(spec, a, b)),
        "sub": lambda a, b: ops.canon(spec, ops.sub(spec, a, b)),
        "neg": lambda a: ops.canon(spec, ops.neg(spec, a)),
        "mul": lambda a, b: ops.canon(spec, ops.mul(spec, a, b)),
        "inv": lambda a: ops.canon(spec, ops.inv(spec, a)),
        "binv": lambda a: ops.canon(spec, ops.batch_inv(spec, a)),
        "dot": lambda a, b: ops.canon(spec, ops.dot(spec, a, b)),
        "muls": lambda a: ops.canon(spec, ops.mul_small(spec, a, 12345)),
        "canon": lambda a: ops.canon(spec, a),
        "sq10": lambda a: functools.reduce(lambda x, _: ops.mul(spec, x, x), range(10), a),
        "eq": lambda a, b: ops.eq(spec, a, b),
        "iszero": lambda a: ops.is_zero(spec, a),
    }
    return jax.jit(fns[name])


def rand_elems(spec, n, seed=0):
    r = random.Random(seed * 7919 + (1 if spec.kind == "scalar" else 2))
    return [r.randrange(spec.modulus) for _ in range(n)]


def to_dev(spec, xs):
    return jax.numpy.asarray(fields.ints_to_limbs(xs))


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_codec_roundtrip(spec):
    xs = rand_elems(spec, 16, 1) + [0, 1, spec.modulus - 1]
    assert fields.limbs_to_ints(np.asarray(to_dev(spec, xs))) == xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    xs, ys = rand_elems(spec, 32, 2), rand_elems(spec, 32, 3)
    a, b = to_dev(spec, xs), to_dev(spec, ys)
    m = spec.modulus
    assert fields.limbs_to_ints(J(spec, "add")(a, b)) == [(x + y) % m for x, y in zip(xs, ys)]
    assert fields.limbs_to_ints(J(spec, "sub")(a, b)) == [(x - y) % m for x, y in zip(xs, ys)]
    assert fields.limbs_to_ints(J(spec, "neg")(a)) == [(-x) % m for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul(spec):
    xs = rand_elems(spec, 60, 4) + [0, 1, spec.modulus - 1, 2**252]
    ys = rand_elems(spec, 60, 5) + [spec.modulus - 1, spec.modulus - 1, 2, 3]
    got = fields.limbs_to_ints(J(spec, "mul")(to_dev(spec, xs), to_dev(spec, ys)))
    assert got == [(x * y) % spec.modulus for x, y in zip(xs, ys)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul_chain_stays_semi(spec):
    xs = rand_elems(spec, 8, 6)
    out = J(spec, "sq10")(to_dev(spec, xs))
    want = xs
    for _ in range(10):
        want = [(x * x) % spec.modulus for x in want]
    semi = np.asarray(out)
    assert semi.max() < (1 << 13), "limbs escaped semi range"
    assert fields.limbs_to_ints(J(spec, "canon")(out)) == want


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_inv(spec):
    xs = rand_elems(spec, 6, 7) + [1, spec.modulus - 1]
    a = to_dev(spec, xs)
    got = fields.limbs_to_ints(J(spec, "inv")(a))
    assert got == [pow(x, spec.modulus - 2, spec.modulus) for x in xs]
    assert bool(J(spec, "iszero")(J(spec, "inv")(ops.zeros((3,)))).all())


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_batch_inv(spec):
    xs = rand_elems(spec, 7, 8) + [0]
    got = fields.limbs_to_ints(J(spec, "binv")(to_dev(spec, xs)))
    assert got == [pow(x, spec.modulus - 2, spec.modulus) if x else 0 for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul_small_dot(spec):
    xs = rand_elems(spec, 16, 9)
    got = fields.limbs_to_ints(J(spec, "muls")(to_dev(spec, xs)))
    assert got == [(x * 12345) % spec.modulus for x in xs]
    n = 23  # deliberately not a multiple of the dot chunk size
    us, vs = rand_elems(spec, n, 10), rand_elems(spec, n, 11)
    got = fields.limbs_to_int(np.asarray(J(spec, "dot")(to_dev(spec, us), to_dev(spec, vs))))
    assert got == sum(u * v for u, v in zip(us, vs)) % spec.modulus


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_canon_eq(spec):
    m = spec.modulus
    a = to_dev(spec, [m - 1, 1])
    plus_m = J(spec, "add")(a, ops.zeros((2,)))
    assert bool(J(spec, "eq")(a, plus_m).all())
    assert not bool(J(spec, "eq")(a, to_dev(spec, [m - 2, 2])).any())


def test_vmap():
    spec = SCALAR
    xs = rand_elems(spec, 8, 12)
    a = to_dev(spec, xs)
    g = jax.jit(jax.vmap(lambda u: ops.canon(spec, ops.square(spec, u))))
    assert fields.limbs_to_ints(g(a)) == [(x * x) % spec.modulus for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mxu_kernels(spec):
    """mul_scalar (Toeplitz int8 matmul) and dot_mxu (limb-cross matmul)
    vs the big-int oracle, on SEMI-form (non-canonical) inputs — the forms
    the provers actually feed them (r05 MXU kernels)."""
    r = random.Random(11)
    n = 700
    xs = [r.randrange(spec.modulus) for _ in range(n)]
    ys = [r.randrange(spec.modulus) for _ in range(n)]
    k = r.randrange(spec.modulus)
    a = jax.numpy.asarray(fields.ints_to_limbs(xs))
    b = jax.numpy.asarray(fields.ints_to_limbs(ys))
    kk = jax.numpy.asarray(fields.int_to_limbs(k))
    # put inputs into genuine semi form (limbs can exceed 2^12-1)
    semi = jax.jit(lambda u, v: ops.add(spec, u, v))
    a_semi = semi(a, jax.numpy.zeros_like(a))
    k_semi = jax.jit(lambda u: ops.mul(spec, u, ops.ones(spec)))(kk)

    ms = jax.jit(
        lambda d, s: ops.canon(spec, ops.mul_scalar(spec, d, s))
    )
    got = np.asarray(ms(a_semi, k_semi))
    want = [(x * k) % spec.modulus for x in xs]
    assert [fields.limbs_to_int(row) for row in got] == want

    # dot_mxu incl. the chunk boundary (shrink the chunk to force 3 chunks)
    import otti_tpu.field.ops as O

    old = O.DOT_MXU_CHUNK
    O.DOT_MXU_CHUNK = 256
    try:
        dt = jax.jit(lambda u, v: ops.canon(spec, ops.dot_mxu(spec, u, v)))
        got_d = fields.limbs_to_int(np.asarray(dt(a_semi, b)))
        want_d = sum(x * y for x, y in zip(xs, ys)) % spec.modulus
        assert got_d == want_d
    finally:
        O.DOT_MXU_CHUNK = old

    # the F.dot dispatcher (n >= 256 -> MXU path) agrees too
    dd = jax.jit(lambda u, v: ops.canon(spec, ops.dot(spec, u, v)))
    assert fields.limbs_to_int(np.asarray(dd(a_semi, b))) == want_d


def test_pack_words_roundtrip():
    r = random.Random(12)
    xs = [r.randrange(BASE.modulus) for _ in range(257)] + [0, 1, BASE.modulus - 1]
    a = jax.numpy.asarray(fields.ints_to_limbs(xs))
    f = jax.jit(lambda u: ops.unpack_words(ops.pack_words(u)))
    assert np.array_equal(np.asarray(f(a)), np.asarray(a))


def test_parallel_batch_inv():
    r = random.Random(13)
    xs = [r.randrange(1, BASE.modulus) for _ in range(100)]
    a = jax.numpy.asarray(fields.ints_to_limbs(xs))
    f = jax.jit(lambda u: ops.canon(BASE, ops.parallel_batch_inv(BASE, u)))
    got = [fields.limbs_to_int(row) for row in np.asarray(f(a))]
    want = [pow(x, BASE.modulus - 2, BASE.modulus) for x in xs]
    assert got == want
