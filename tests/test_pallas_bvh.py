"""Pallas packet-traversal kernels vs the XLA skip-link traversal
(interpret mode — semantics only; on-chip behavior is covered by
tests/test_tpu_kernels.py in the bench environment).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jet_pbrt_tpu.scene.builder import SceneBuilder
from jet_pbrt_tpu.ops.bvh import intersect_bvh, intersect_instances
from jet_pbrt_tpu.ops.pallas_bvh import (
    intersect_bvh_pallas, intersect_instanced_pallas, planar_tables,
    fits_vmem, TILE,
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


@pytest.fixture(scope="module")
def inst_scene():
    rng = np.random.default_rng(4)
    t = 500
    v0 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    tris = np.stack(
        [v0, v0 + rng.uniform(-0.3, 0.3, (t, 3)),
         v0 + rng.uniform(-0.3, 0.3, (t, 3))], axis=1,
    ).astype(np.float32)
    b = SceneBuilder("inst")
    b.set_camera(lookfrom=(0, 0, 10), lookat=(0, 0, 0))
    b.add_env_light((0, 0, 0))
    m = b.add_matte((0.5, 0.5, 0.5))
    b.add_instanced_mesh(tris, [
        ((0, 0, 0), 1.0, m), ((3, 0, 0), 2.0, m),
        ((0, 4, 0), 0.5, m), ((-3, -1, 2), 1.5, m),
    ])
    return b.build()


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
    h_x = intersect_bvh(pack.bvh_nodes, pack.bvh_tris, o, d, tmin, tmax)
    assert np.array_equal(np.asarray(h_p.valid), np.asarray(h_x.valid))
    assert np.asarray(h_p.valid).sum() > 20
    ok = np.asarray(h_p.valid)
    np.testing.assert_allclose(
        np.asarray(h_p.t)[ok], np.asarray(h_x.t)[ok], rtol=1e-5, atol=1e-4
    )
    assert np.array_equal(
        np.asarray(h_p.index)[ok], np.asarray(h_x.index)[ok]
    )


def test_instanced_packet_matches_xla(inst_scene):
    """Two-level (TLAS/BLAS) packet kernel == per-instance XLA walk,
    including the encoded instance*T+tri winning index."""
    p, m = inst_scene.pack, inst_scene.meta
    rng = np.random.default_rng(7)
    n = TILE + 31
    targets = rng.uniform(-4, 5, (n, 3)).astype(np.float32)
    o = (np.array([[0.0, 0.0, 10.0]], np.float32)
         + rng.normal(0, 2, (n, 3)).astype(np.float32))
    d = targets - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), jnp.inf)

    h_x = intersect_instances(
        p.inst_off, p.inst_scale, p.blas_nodes, p.blas_tris,
        jnp.asarray(o), jnp.asarray(d), tmin, tmax,
    )
    tlas_pl, inst_pl = planar_tables(
        np.asarray(p.tlas_nodes),
        np.concatenate(
            [np.asarray(p.inst_off), np.asarray(p.inst_scale)[:, None]],
            axis=1,
        ),
    )
    bn_pl, bt_pl = planar_tables(np.asarray(p.blas_nodes),
                                 np.asarray(p.blas_tris))
    h_p = intersect_instanced_pallas(
        jnp.asarray(tlas_pl), jnp.asarray(bn_pl), jnp.asarray(bt_pl),
        jnp.asarray(inst_pl), m.n_tlas_nodes, m.n_blas_nodes,
        m.n_blas_tris, jnp.asarray(o), jnp.asarray(d), tmin, tmax,
        interpret=True,
    )
    va = np.asarray(h_x.valid)
    assert va.sum() > 50
    assert np.array_equal(va, np.asarray(h_p.valid))
    np.testing.assert_allclose(
        np.asarray(h_p.t)[va], np.asarray(h_x.t)[va], rtol=1e-5, atol=1e-5
    )
    assert np.array_equal(
        np.asarray(h_p.index)[va], np.asarray(h_x.index)[va]
    )


def test_fits_vmem_gate():
    assert fits_vmem(10_000, 50_000)
    assert not fits_vmem(2_000_000, 2_000_000)
