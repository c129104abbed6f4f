"""Finite-difference gradient verification harness (the BASELINE.json
"pixel-gradient allclose vs finite differences" requirement).

With counter-based RNG the whole render is a deterministic function of the
parameters, so central finite differences are well-defined. Caveat baked
into `check_grads`: parameters that gate *decisions* (russian roulette uses
f, the plastic lobe pick uses Kd/Ks luminance) make the primal only
piecewise-smooth; keep max_depth < 3 (no RR) and matte materials for exact
checks, which is what the tests do.
"""
from __future__ import annotations

import numpy as np
import jax


def finite_diff_grad(f, params: dict, eps: float = 1e-3) -> dict:
    """Central differences of scalar f over every element of a dict-of-arrays
    pytree. O(2 * n_elements) evaluations — keep params tiny."""
    out = {}
    for k, v in params.items():
        v = np.asarray(v, np.float64)
        g = np.zeros_like(v)
        flat = v.reshape(-1)
        gflat = g.reshape(-1)
        for i in range(flat.size):
            p_plus = {**params, k: _bump(v, i, +eps)}
            p_minus = {**params, k: _bump(v, i, -eps)}
            gflat[i] = (float(f(p_plus)) - float(f(p_minus))) / (2 * eps)
        out[k] = g
    return out


def _bump(v: np.ndarray, i: int, eps: float):
    import jax.numpy as jnp

    b = v.copy().reshape(-1)
    b[i] += eps
    # hand jnp arrays back — numpy leaves inside a jitted scan would force
    # __array__ on traced indices
    return jnp.asarray(b.reshape(v.shape).astype(np.float32))


def check_grads(f, params: dict, rtol: float = 5e-2, atol: float = 1e-4,
                eps: float = 1e-3) -> dict:
    """Compare jax.grad(f) against central differences. Returns the two
    gradient pytrees; raises AssertionError on mismatch."""
    g_auto = jax.grad(f)(params)
    g_fd = finite_diff_grad(f, params, eps)
    for k in params:
        a = np.asarray(g_auto[k], np.float64)
        b = g_fd[k]
        denom = np.maximum(np.abs(b), atol / rtol)
        rel = np.abs(a - b) / denom
        mask = (np.abs(a) > atol) | (np.abs(b) > atol)
        assert np.all(rel[mask] < rtol), (
            f"grad mismatch for {k}: auto={a}, fd={b}"
        )
    return g_auto, g_fd
