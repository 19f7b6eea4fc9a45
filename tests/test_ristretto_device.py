"""Device ristretto compression vs the host/native oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from otti_tpu.curve import edwards as E, ristretto
from otti_tpu.field.fields import ints_to_limbs
from otti_tpu.refimpl import numeric as ref


def test_encode_matches_host_batch():
    ks = [1, 2, 3, 7, 12345, ref.L - 1, 0xDEADBEEF, 2**200 + 9]
    pts = E.stack(
        [E.from_ref(ref.EdPoint.base() * k) for k in ks]
    )
    enc = np.asarray(jax.jit(ristretto.encode)(pts))
    for i, k in enumerate(ks):
        want = (ref.EdPoint.base() * k).ristretto_encode()
        assert enc[i].tobytes() == want, f"k={k}"


def test_encode_identity():
    pid = E.identity((1,))
    enc = np.asarray(jax.jit(ristretto.encode)(pid))
    assert enc[0].tobytes() == b"\x00" * 32


def test_encode_device_computed_points():
    """Points produced by device scalar_mul (not host-imported) encode
    identically — exercises semi-reduced inputs."""
    k = 987654321987654321
    kl = jnp.asarray(ints_to_limbs([k]))[0]
    p = E.scalar_mul(E.base_point(), kl)
    enc = np.asarray(jax.jit(ristretto.encode)(jax.tree.map(lambda a: a[None], p)))
    want = (ref.EdPoint.base() * k).ristretto_encode()
    assert enc[0].tobytes() == want
