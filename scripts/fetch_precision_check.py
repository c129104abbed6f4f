"""Verify on-chip that a one-hot f32 MXU contraction at Precision.HIGH
(bf16_3x) is BIT-EXACT: each f32 operand splits into three bf16 parts
covering all 24 mantissa bits, and a one-hot weight selects exactly one
product per output — no summation error is possible. This justifies the
wide kernel's leaf fetch running at HIGH (3 MXU passes) instead of
HIGHEST (6)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")


def main():
    rng = np.random.default_rng(0)
    # adversarial f32 values: full mantissas, wide exponent range, subnorms
    vals = np.concatenate([
        rng.standard_normal(64 * 128).astype(np.float32),
        (rng.standard_normal(32 * 128) * 10.0 ** rng.integers(
            -30, 30, 32 * 128)).astype(np.float32),
        np.float32(1.0) + np.float32(2.0) ** -23
        * rng.integers(0, 2 ** 23, 48 * 128).astype(np.float32),
    ])[: 144 * 128].reshape(144, 128)
    table = jnp.asarray(vals)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def fetch_all(table, prec):
        eye = jnp.eye(128, dtype=jnp.float32)
        return lax.dot_general(table, eye, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)

    hi = np.asarray(fetch_all(table, lax.Precision.HIGHEST))
    h = np.asarray(fetch_all(table, lax.Precision.HIGH))
    ref = np.asarray(table)
    print("HIGHEST bit-equal to table:",
          np.array_equal(hi.view(np.int32), ref.view(np.int32)))
    print("HIGH    bit-equal to table:",
          np.array_equal(h.view(np.int32), ref.view(np.int32)))
    bad = (h.view(np.int32) != ref.view(np.int32)).sum()
    print(f"HIGH mismatching elements: {bad}/{ref.size}")
    assert bad == 0, "HIGH one-hot fetch is NOT exact on this chip"
    print("OK: HIGH one-hot fetch is exact")


if __name__ == "__main__":
    main()
