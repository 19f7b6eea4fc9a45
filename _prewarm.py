"""AOT-prewarm the zk phase kernels for the given (num_cons, num_z) classes."""
import sys, time
from otti_tpu import runtime
runtime.use_tpu()
import jax, jax.numpy as jnp
from otti_tpu.spartan import hybrid
from otti_tpu.field.fields import N_LIMBS

I32 = jnp.int32
def sds(*shape):
    return jax.ShapeDtypeStruct(shape, I32)
def u8(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.uint8)

classes = [tuple(map(int, a.split('x'))) for a in sys.argv[1:]]
L = N_LIMBS
TBL5 = {k: sds(5*64*16, L) for k in ("x","y","z","t")}
TBL2 = {k: sds(2*64*16, L) for k in ("x","y","z","t")}
TBL4 = {k: sds(4*64*16, L) for k in ("x","y","z","t")}
for nc, nz in classes:
    mu_x = (nc-1).bit_length(); mu_y = (nz-1).bit_length()
    t0=time.time()
    sc1b = (sds(mu_x, L), sds(mu_x, L), sds(mu_x, 4, L), sds(mu_x, L), sds(mu_x, L))
    hybrid._zk_phase1_kernel(nc).lower(
        u8(200), sds(mu_x, L), sds(nc, L), sds(nc, L), sds(nc, L), sds(nc, L),
        sc1b, sds(4, L), sds(5, L), sds(L), TBL5, TBL2,
    ).compile()
    print(f"phase1 {nc} compiled in {time.time()-t0:.0f}s", flush=True)
    t0=time.time()
    sc2b = (sds(mu_y, L), sds(mu_y, L), sds(mu_y, 3, L), sds(mu_y, L), sds(mu_y, L))
    hybrid._zk_phase2_kernel(nz).lower(
        u8(200), sds(nz, L), sds(nz, L), sds(L), sds(L), sc2b, TBL4,
    ).compile()
    print(f"phase2 {nz} compiled in {time.time()-t0:.0f}s", flush=True)
print("prewarm done", flush=True)
