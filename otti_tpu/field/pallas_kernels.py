"""Pallas TPU kernels for the field-arithmetic hot path (opt-in).

The XLA path (field/ops.py) expresses one modular multiply as ~10 fused
ops with HBM-materialized intermediates between the conv loop, carry
scan, and fold.  This kernel fuses the whole pipeline in VMEM with a
limb-major layout ([N_LIMBS, batch]: batch along the 128-wide lane axis,
limbs along sublanes), eliminating the intermediate traffic — the
speed-of-light shape for the VPU (see /opt/skills/guides/pallas_guide.md).

Status: correctness-validated in interpreter mode (CPU tests) AND on the
real axon TPU (batch 4096: 15.9M mul/s).  The fused-op XLA path currently
pipelines small/medium batches better (144M mul/s at the same size —
per-pallas_call launch overhead dominates until batches reach millions),
so XLA remains the default; this kernel is the substrate for a future
fully-fused sumcheck-round kernel where VMEM residency pays off.
Opt-in via OTTI_PALLAS=1.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .fields import CONV_LIMBS, FOLD_LIMB, LIMB_BITS, LIMB_MASK, N_LIMBS, FieldSpec

ENABLED = os.environ.get("OTTI_PALLAS", "0") == "1"


def _mul_kernel_factory(spec: FieldSpec):
    # modulus constants baked in as static python ints (mosaic supports
    # neither captured arrays nor int32 matmuls on the MXU)
    fold_mat = [[int(v) for v in row] for row in spec.fold_matrix]
    mod_limbs = [int(v) for v in spec.modulus_limbs]
    tail_limbs = (
        [int(v) for v in spec.tail_limbs] if spec.kind == "scalar" else []
    )

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        B = a.shape[1]
        # --- schoolbook conv: c[k] = sum_i a[i] * b[k-i]  ([43, B]) -------
        # mosaic TC lowering supports neither dynamic_slice nor scatter-add,
        # so build each output row as an explicit sum (static unroll)
        rows = []
        for k in range(CONV_LIMBS):
            acc = None
            for i in range(max(0, k - (N_LIMBS - 1)), min(N_LIMBS - 1, k) + 1):
                term = a[i] * b[k - i]
                acc = term if acc is None else acc + term
            rows.append(acc)
        c = jnp.stack(rows)
        # --- carry to 44 normalized limbs --------------------------------
        def carry_rows(x, n_out):
            carry = jnp.zeros((x.shape[1],), jnp.int32)
            rows = []
            for i in range(n_out - 1):
                v = (x[i] if i < x.shape[0] else 0) + carry
                limb = v & LIMB_MASK
                carry = (v - limb) >> LIMB_BITS
                rows.append(limb)
            v = (x[n_out - 1] if n_out - 1 < x.shape[0] else 0) + carry
            rows.append(v)
            return jnp.stack(rows)

        c = carry_rows(c, CONV_LIMBS + 1)  # [44, B]
        # --- fold high limbs: static-constant row combinations ------------
        high = c[FOLD_LIMB:]  # [23, B]
        n_high = CONV_LIMBS + 1 - FOLD_LIMB
        zero_row = jnp.zeros((1, B), jnp.int32)
        fold_rows = []
        for l in range(N_LIMBS):
            acc = c[l] if l < FOLD_LIMB else jnp.zeros((B,), jnp.int32)
            for h in range(n_high):
                w = fold_mat[h][l]
                if w:
                    acc = acc + w * high[h]
            fold_rows.append(acc)
        folded = jnp.stack(fold_rows)
        x = carry_rows(folded, FOLD_LIMB + 2)  # [23, B]
        # --- final fold (no .at[] — mosaic has no scatter) ----------------
        if spec.kind == "scalar":
            h0, h1 = x[FOLD_LIMB], x[FOLD_LIMB + 1]
            out_rows = []
            for l in range(N_LIMBS):
                acc = jnp.full((B,), mod_limbs[l], jnp.int32)
                if l < FOLD_LIMB:
                    acc = acc + x[l]
                if l < 11:
                    acc = acc - tail_limbs[l] * h0
                if 1 <= l < 12:
                    acc = acc - tail_limbs[l - 1] * h1
                out_rows.append(acc)
            o_ref[:] = carry_rows(jnp.stack(out_rows), N_LIMBS)
        else:
            h = x[FOLD_LIMB] >> 3
            for j in range(FOLD_LIMB + 1, x.shape[0]):
                h = h + (x[j] << (LIMB_BITS * (j - FOLD_LIMB) - 3))
            out = jnp.concatenate(
                [
                    (x[0] + 19 * h)[None, :],
                    x[1:FOLD_LIMB],
                    (x[FOLD_LIMB] & 7)[None, :],
                ],
                axis=0,
            )
            o_ref[:] = carry_rows(out, N_LIMBS)

    return kernel


@functools.lru_cache(maxsize=None)
def _mul_call(spec: FieldSpec, batch: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _mul_kernel_factory(spec)
    shape = jax.ShapeDtypeStruct((N_LIMBS, batch), jnp.int32)
    return jax.jit(
        lambda a, b: pl.pallas_call(
            kernel,
            out_shape=shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(a, b)
    )


def mul_pallas(spec: FieldSpec, a: jax.Array, b: jax.Array, interpret: bool = False):
    """Batched field mul via the fused Pallas kernel.

    a, b: [..., N_LIMBS] (same layout as field.ops); handles the limb-major
    transposition at the boundary.
    """
    batch_shape = a.shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    pad = (-n) % 128
    am = jnp.moveaxis(a.reshape(n, N_LIMBS), -1, 0)
    bm = jnp.moveaxis(b.reshape(n, N_LIMBS), -1, 0)
    if pad:
        am = jnp.pad(am, ((0, 0), (0, pad)))
        bm = jnp.pad(bm, ((0, 0), (0, pad)))
    out = _mul_call(spec, n + pad, interpret)(am, bm)
    out = jnp.moveaxis(out[:, :n], 0, -1)
    return out.reshape(batch_shape + (N_LIMBS,))
