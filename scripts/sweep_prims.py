"""Validate the cull-sweep kernel's enabling primitives on-chip:
  1. DMA VMEM scratch -> SMEM scratch (for the group-key scan)
  2. dot_general((4,128),(4,128), contract dim0 both) -> (128,128) on MXU
  3. lane-roll min for super-group packing
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(a_ref, b_ref, out_ref, vscr, sscr, sem):
    # 2. dot_general contracting dim 0 of both operands
    a = a_ref[:]                 # (4, 128)
    b = b_ref[:]                 # (4, 128)
    o = lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (128,128)
    # 3. lane-roll min: every lane := min over its 8-lane block
    k = o[0:1, :]                                            # (1,128)
    for sh in (1, 2, 4):
        k = jnp.minimum(k, pltpu.roll(k, sh, 1))
    # 1. write keys to VMEM scratch, DMA to SMEM, scalar-read back
    vscr[0:1, :] = k
    dma = pltpu.make_async_copy(vscr, sscr, sem)
    dma.start()
    dma.wait()
    s = sscr[0, 0] + sscr[0, 8] + sscr[0, 120]
    out_ref[:] = o + s


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32),
                        pltpu.SMEM((1, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    r = np.asarray(jax.jit(f)(a, b))
    want = np.asarray(a).T @ np.asarray(b)
    k = want[0, :]
    kmin = k.reshape(16, 8).min(axis=1)
    s = kmin[0] + kmin[1] + kmin[15]
    np.testing.assert_allclose(r, want + s, rtol=1e-5, atol=1e-4)
    print("all primitives OK")


if __name__ == "__main__":
    main()
