"""Pallas packet-traversal kernel vs the XLA skip-link traversal
(interpret mode — semantics only; perf characteristics live on real TPUs).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jet_pbrt_tpu.scene.builder import SceneBuilder
from jet_pbrt_tpu.ops.bvh import intersect_bvh
from jet_pbrt_tpu.ops.pallas_bvh import (
    intersect_bvh_pallas, planar_tables, fits_vmem, TILE,
)


@pytest.fixture(scope="module")
def mesh_scene():
    rng = np.random.default_rng(3)
    t = 800
    base = rng.uniform(-10, 10, (t, 1, 3)).astype(np.float32)
    tris = base + rng.uniform(-0.8, 0.8, (t, 3, 3)).astype(np.float32)
    b = SceneBuilder("pl")
    b.set_camera(lookfrom=(0, 0, 40), lookat=(0, 0, 0))
    m = b.add_matte((0.5, 0.5, 0.5))
    b.add_mesh(tris, m)
    return b.build(use_bvh=True)


def test_packet_matches_xla_traversal(mesh_scene):
    pack = mesh_scene.pack
    n = 2 * TILE + 17  # exercise padding
    o = jnp.zeros((n, 3)) + jnp.asarray([0.0, 0.0, 12.0])
    d = jax.random.normal(jax.random.key(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), jnp.inf)

    npn, npt = planar_tables(pack.bvh_nodes, pack.bvh_tris)
    h_p = intersect_bvh_pallas(
        jnp.asarray(npn), jnp.asarray(npt),
        pack.bvh_nodes.shape[0], pack.bvh_tris.shape[0],
        o, d, tmin, tmax, interpret=True,
    )
    h_x = intersect_bvh(pack, o, d, tmin, tmax)
    assert np.array_equal(np.asarray(h_p.valid), np.asarray(h_x.valid))
    assert np.asarray(h_p.valid).sum() > 20
    ok = np.asarray(h_p.valid)
    np.testing.assert_allclose(
        np.asarray(h_p.t)[ok], np.asarray(h_x.t)[ok], rtol=1e-5, atol=1e-4
    )
    assert np.array_equal(
        np.asarray(h_p.index)[ok], np.asarray(h_x.index)[ok]
    )


def test_fits_vmem_gate():
    assert fits_vmem(10_000, 50_000)
    assert not fits_vmem(2_000_000, 2_000_000)
