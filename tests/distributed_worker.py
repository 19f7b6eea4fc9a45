"""Worker for the 2-process jax.distributed smoke test (SURVEY.md §5.8).

Each process owns ONE CPU device; together they form a 2-device global
mesh over the localhost coordinator.  The worker drives the real sharded
sumcheck-round kernel (parallel.sharded.round_cubic_sharded — shard-local
binds + one cross-PROCESS psum of 3 field scalars) on a global array
assembled from per-process shards, and process 0 checks the result
against exact host arithmetic.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    proc_id = int(sys.argv[1])
    port = sys.argv[2]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 1)
    except Exception:
        pass

    from otti_tpu import runtime

    assert runtime.init_distributed(f"localhost:{port}", 2, proc_id)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from otti_tpu.field.fields import SCALAR, ints_to_limbs, limbs_to_int
    from otti_tpu.parallel import sharded

    MOD = SCALAR.modulus
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 2), ("dp", "sp"))

    # deterministic tables, n = 8 elements -> 4 per process
    n, half = 8, 4
    rng = np.random.default_rng(42)
    tables_ints = [
        [int(v) for v in rng.integers(1, 2**61, n)] for _ in range(4)
    ]

    def make_global(vals):
        local = jnp.asarray(
            ints_to_limbs(vals[proc_id * half : (proc_id + 1) * half])
        )
        sh = NamedSharding(mesh, P("sp", None))
        return jax.make_array_from_single_device_arrays(
            (n, local.shape[1]),
            sh,
            [jax.device_put(local, jax.local_devices()[0])],
        )

    eq, pa, pb, pc = (make_global(v) for v in tables_ints)
    e0, e2, e3 = sharded.round_cubic_sharded(mesh, eq, pa, pb, pc)

    # exact host ground truth (LSB-first binding convention of sharded.py)
    def ext(vals, t):
        lo, hi = vals[0::2], vals[1::2]
        return [(a + t * (b - a)) % MOD for a, b in zip(lo, hi)]

    expect = []
    for t in (0, 2, 3):
        eqt, at, bt, ct = (ext(v, t) for v in tables_ints)
        expect.append(
            sum(e * ((a * b - c) % MOD) for e, a, b, c in zip(eqt, at, bt, ct))
            % MOD
        )

    got = [
        limbs_to_int(np.asarray(jax.device_get(x))) % MOD
        for x in (e0, e2, e3)
    ]
    assert got == expect, (got, expect)
    print(f"DISTOK proc={proc_id} psum-round matched host ground truth")


if __name__ == "__main__":
    main()
