"""BSDF tests: reciprocity-free sanity, sample/pdf consistency (the MC
estimate of directional-hemispherical reflectance must match), energy
conservation, fresnel identities. Validates the math of reference
src/bsdf.h / src/bsdf.cc / src/microfacet.cc."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jet_pbrt_tpu.ops import bsdf as B
from jet_pbrt_tpu.ops import microfacet as mf
from jet_pbrt_tpu.ops.fresnel import fresnel_dielectric, fresnel_conductor
from jet_pbrt_tpu.ops.linalg import PI


def const_lobe(kind, n, **kw):
    """Build a homogeneous batch lobe."""
    defaults = dict(
        f0=jnp.ones((n, 3)) * 0.8, f1=jnp.zeros((n, 3)), f2=jnp.zeros((n, 3)),
        a0=jnp.zeros((n,)), a1=jnp.zeros((n,)),
        fr_conductor=jnp.zeros((n,), bool),
        fr_eta_i=jnp.ones((n,)), fr_eta_t=jnp.ones((n,)),
        mf_kind=jnp.full((n,), mf.GGX, jnp.int32),
    )
    defaults.update(kw)
    return B.Lobe(kind=jnp.full((n,), kind, jnp.int32), **defaults)


def wo_batch(n, z=0.6):
    wo = jnp.asarray([[np.sqrt(1 - z * z), 0.0, z]] * n, jnp.float32)
    return wo


def test_lambert_eval_pdf():
    n = 4
    lobe = const_lobe(B.LOBE_LAMBERT, n)
    wo = wo_batch(n)
    wi = jnp.asarray([[0, 0, 1]] * n, jnp.float32)
    f = B.eval_f(lobe, wo, wi)
    assert np.allclose(np.asarray(f), 0.8 / PI, atol=1e-6)
    p = B.pdf(lobe, wo, wi)
    assert np.allclose(np.asarray(p), 1.0 / PI, atol=1e-6)
    # opposite hemisphere -> 0
    wi_b = jnp.asarray([[0, 0, -1]] * n, jnp.float32)
    assert np.allclose(np.asarray(B.eval_f(lobe, wo, wi_b)), 0.0)


def test_lambert_white_furnace():
    """E[f cos / pdf] over sampled dirs == albedo (reflectance estimate)."""
    n = 200_000
    lobe = const_lobe(B.LOBE_LAMBERT, n)
    wo = wo_batch(n)
    u = jax.random.uniform(jax.random.key(0), (n, 2))
    s = B.sample(lobe, wo, u)
    est = np.asarray(s.f * jnp.abs(s.wi[:, 2:3]) / jnp.maximum(s.pdf, 1e-9)[:, None])
    assert np.allclose(est.mean(0), 0.8, atol=5e-3)


def test_specular_mirror():
    n = 4
    lobe = const_lobe(B.LOBE_SPECULAR, n)
    wo = wo_batch(n)
    s = B.sample(lobe, wo, jnp.zeros((n, 2)))
    # wi = mirrored wo (reference: src/bsdf.h:415-430)
    assert np.allclose(np.asarray(s.wi), np.asarray(wo) * np.array([-1, -1, 1]), atol=1e-6)
    assert np.allclose(np.asarray(s.pdf), 1.0)
    # f = R/|cos|, so f*cos/pdf == R exactly
    est = np.asarray(s.f * jnp.abs(s.wi[:, 2:3]) / s.pdf[:, None])
    assert np.allclose(est, 0.8, atol=1e-5)
    assert bool(s.is_specular[0])


def test_fresnel_glass_energy():
    """Glass: reflected+transmitted weights average to Kr/Kt-weighted 1."""
    n = 400_000
    lobe = const_lobe(
        B.LOBE_FRESNEL, n,
        f0=jnp.ones((n, 3)), f1=jnp.ones((n, 3)),
        a0=jnp.full((n,), 1.5),
    )
    wo = wo_batch(n)
    u = jax.random.uniform(jax.random.key(1), (n, 2))
    s = B.sample(lobe, wo, u)
    # f*|cos|/pdf is exactly 1 for reflected lanes and (etaI/etaT)^2 for
    # transmitted lanes — the reference's radiance-compression factor
    # (reference: src/bsdf.h:525-526).
    est = np.asarray(s.f * jnp.abs(s.wi[:, 2:3]) / jnp.maximum(s.pdf, 1e-9)[:, None])
    reflected = np.asarray(s.wi[:, 2]) > 0
    assert np.allclose(est[reflected], 1.0, atol=1e-4)
    assert np.allclose(est[~reflected], (1.0 / 1.5) ** 2, atol=1e-4)
    # and the full scatter probability integrates to 1: E[pick weights] = 1
    # (F + (1-F) partition), checked via the pdf being F or 1-F.
    p = np.asarray(s.pdf)
    assert np.all((p > 0) & (p <= 1))


def test_fresnel_dielectric_limits():
    # normal incidence: R = ((n1-n2)/(n1+n2))^2 = 0.04 for n=1.5
    f0 = float(fresnel_dielectric(jnp.asarray(1.0), 1.0, 1.5))
    assert abs(f0 - 0.04) < 1e-4
    # grazing -> 1
    fg = float(fresnel_dielectric(jnp.asarray(0.001), 1.0, 1.5))
    assert fg > 0.98
    # TIR from inside beyond critical angle (sin_c = 1/1.5 -> cos_c ~ 0.745)
    ft = float(fresnel_dielectric(jnp.asarray(-0.3), 1.0, 1.5))
    assert ft == 1.0


def test_fresnel_conductor_range():
    eta = jnp.asarray([[0.18, 0.15, 0.81]])
    k = jnp.asarray([[3.0, 2.5, 2.0]])
    f = np.asarray(fresnel_conductor(jnp.asarray([0.7]), 1.0, eta, k))
    assert np.all(f >= 0) and np.all(f <= 1)


def test_ggx_pdf_matches_sampling_histogram():
    """VNDF sampling must be consistent with pdf_wh: E[D_vis/pdf] = 1."""
    n = 400_000
    ax = jnp.full((n,), 0.3)
    wo = wo_batch(n, z=0.7)
    u = jax.random.uniform(jax.random.key(2), (n, 2))
    kind = jnp.full((n,), mf.GGX, jnp.int32)
    wh = mf.sample_wh(kind, wo, ax, ax, u)
    pdf = np.asarray(mf.pdf_wh(kind, wo, wh, ax, ax))
    assert np.all(pdf > 0)
    # integral of pdf over sampled dist == 1 (self-consistency, E[pdf/pdf])
    # stronger: estimate the visible-normal normalization:
    # \int D(wh) G1(wo) |wo.wh| / cos(wo) dwh = 1
    d = np.asarray(mf.d(kind, wh, ax, ax))
    g1 = np.asarray(mf.g1(kind, wo, ax, ax))
    dotwh = np.asarray(jnp.sum(wo * wh, -1))
    coswo = float(wo[0, 2])
    est = d * g1 * np.abs(dotwh) / coswo / pdf
    assert abs(est.mean() - 1.0) < 5e-3


def test_microfacet_energy_bounded():
    """GGX reflection with NoOp-ish fresnel (conductor k=0 eta=1 is not
    no-op; use dielectric) keeps reflected energy <= 1."""
    n = 300_000
    lobe = const_lobe(
        B.LOBE_MICROFACET, n,
        f0=jnp.ones((n, 3)),
        a0=jnp.full((n,), 0.3), a1=jnp.full((n,), 0.3),
        fr_eta_i=jnp.full((n,), 1.5), fr_eta_t=jnp.ones((n,)),
    )
    wo = wo_batch(n, z=0.8)
    u = jax.random.uniform(jax.random.key(3), (n, 2))
    s = B.sample(lobe, wo, u)
    est = np.asarray(s.f * jnp.abs(s.wi[:, 2:3]) / jnp.maximum(s.pdf, 1e-9)[:, None])
    mean = est.mean(0)
    assert np.all(mean > 0.01) and np.all(mean <= 1.01)


def test_microfacet_sample_eval_pdf_consistent():
    n = 50_000
    lobe = const_lobe(
        B.LOBE_MICROFACET, n,
        a0=jnp.full((n,), 0.4), a1=jnp.full((n,), 0.4),
        fr_conductor=jnp.ones((n,), bool),
        f1=jnp.ones((n, 3)) * 0.2, f2=jnp.ones((n, 3)) * 3.0,
    )
    wo = wo_batch(n, z=0.5)
    u = jax.random.uniform(jax.random.key(4), (n, 2))
    s = B.sample(lobe, wo, u)
    ok = np.asarray(s.pdf) > 0
    f_eval = np.asarray(B.eval_f(lobe, wo, s.wi))
    p_eval = np.asarray(B.pdf(lobe, wo, s.wi))
    assert np.allclose(f_eval[ok], np.asarray(s.f)[ok], rtol=2e-3, atol=1e-5)
    assert np.allclose(p_eval[ok], np.asarray(s.pdf)[ok], rtol=2e-3, atol=1e-5)


def test_make_lobe_matte_and_metal():
    mk = jnp.asarray([B.MAT_MATTE, B.MAT_METAL], jnp.int32)
    c0 = jnp.asarray([[0.5, 0.5, 0.5], [0.18, 0.15, 0.81]])
    c1 = jnp.asarray([[0, 0, 0], [0.11, 0.11, 0.11]])
    s0 = jnp.asarray([0.0, 0.2])
    s1 = jnp.asarray([0.0, 0.2])
    remap = jnp.asarray([False, False])
    lobe = B.make_lobe(mk, c0, c1, s0, s1, remap, jnp.asarray([0.5, 0.5]))
    assert int(lobe.kind[0]) == B.LOBE_LAMBERT
    assert int(lobe.kind[1]) == B.LOBE_MICROFACET
    assert bool(lobe.fr_conductor[1])
    assert np.allclose(np.asarray(lobe.f0[1]), 1.0)   # metal R=1
    assert float(lobe.a0[1]) == pytest.approx(0.2)


def test_make_lobe_plastic_pick():
    """Plastic picks Lambert w.p. Qd and compensates by 1/Qd
    (reference: src/material.cc:12-29)."""
    kd = np.array([0.35, 0.12, 0.48], np.float32)
    ks = 1.0 - kd
    mk = jnp.full((2,), B.MAT_PLASTIC, jnp.int32)
    c0 = jnp.asarray([kd, kd])
    c1 = jnp.asarray([ks, ks])
    s0 = jnp.full((2,), 0.1)
    lobe = B.make_lobe(mk, c0, c1, s0, s0, jnp.zeros((2,), bool),
                       jnp.asarray([0.0, 0.99]))  # first diffuse, second glossy
    assert int(lobe.kind[0]) == B.LOBE_LAMBERT
    assert int(lobe.kind[1]) == B.LOBE_MICROFACET
    lum = 0.212671 * kd[0] + 0.715160 * kd[1] + 0.072169 * kd[2]
    lum_s = 0.212671 * ks[0] + 0.715160 * ks[1] + 0.072169 * ks[2]
    qd = lum / (lum + lum_s)
    assert np.allclose(np.asarray(lobe.f0[0]), kd / qd, rtol=1e-5)
    assert np.allclose(np.asarray(lobe.f0[1]), ks / (1 - qd), rtol=1e-5)
    assert float(lobe.fr_eta_i[1]) == pytest.approx(1.5)


def test_roughness_remap():
    a = float(mf.roughness_to_alpha(jnp.asarray(0.2)))
    # pbrt's log-polynomial remap of 0.2 evaluates to ~0.684
    assert abs(a - 0.684) < 5e-3
    # monotone in roughness
    assert float(mf.roughness_to_alpha(jnp.asarray(0.05))) < a


def test_microfacet_transmission_refracts():
    """Transmission lobe: sampled wi crosses the interface, f/pdf finite,
    and eval/pdf agree with the sample (reference: src/bsdf.cc:80-145)."""
    n = 50_000
    lobe = const_lobe(
        B.LOBE_MICROFACET_TRANS, n,
        f0=jnp.ones((n, 3)) * 0.9,
        a0=jnp.full((n,), 0.3), a1=jnp.full((n,), 0.3),
        fr_eta_i=jnp.ones((n,)), fr_eta_t=jnp.full((n,), 1.5),
    )
    wo = wo_batch(n, z=0.7)
    u = jax.random.uniform(jax.random.key(9), (n, 2))
    s = B.sample(lobe, wo, u)
    ok = np.asarray(s.pdf) > 0
    assert ok.mean() > 0.5  # most samples refract at this roughness
    wi = np.asarray(s.wi)[ok]
    assert np.all(wi[:, 2] < 0)  # crossed into the lower hemisphere
    f_eval = np.asarray(B.eval_f(lobe, wo, s.wi))[ok]
    p_eval = np.asarray(B.pdf(lobe, wo, s.wi))[ok]
    np.testing.assert_allclose(f_eval, np.asarray(s.f)[ok], rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(p_eval, np.asarray(s.pdf)[ok], rtol=5e-3, atol=1e-5)
    # energy bounded
    est = np.asarray(s.f * jnp.abs(s.wi[:, 2:3]) / jnp.maximum(s.pdf, 1e-9)[:, None])
    assert est[ok].mean() <= 1.0


def test_roughglass_material_scatters_both_sides():
    mk = jnp.full((2,), B.MAT_ROUGHGLASS, jnp.int32)
    c0 = jnp.ones((2, 3)) * 0.9
    c1 = jnp.ones((2, 3)) * 0.9
    s0 = jnp.full((2,), 0.3)   # roughness
    s1 = jnp.full((2,), 1.5)   # eta
    lobe = B.make_lobe(mk, c0, c1, s0, s1, jnp.zeros((2,), bool),
                       jnp.asarray([0.1, 0.9]))
    assert int(lobe.kind[0]) == B.LOBE_MICROFACET
    assert int(lobe.kind[1]) == B.LOBE_MICROFACET_TRANS
    assert float(lobe.fr_eta_t[1]) == pytest.approx(1.5)


# ---------------------------------------------------------------------------
# Beckmann VNDF (reference: src/microfacet.cc:212-254, samplevis=true) and
# Phong (reference: src/bsdf.h:555-631) — wired via builder round 2.
# ---------------------------------------------------------------------------

def _histogram_matches_pdf(kind, ax, ay, woz, seed, n=400_000, nbins=12):
    """Bin sampled half-vectors by cos(theta) and compare each bin's mass to
    the MC integral of pdf_wh over the same bin (uniform-hemisphere MC with
    the sampler's support max(0, wo.wh)). Catches wrong-distribution bugs a
    pdf/pdf self-consistency check cannot."""
    axv = jnp.full((n,), ax)
    ayv = jnp.full((n,), ay)
    wo = wo_batch(n, z=woz)
    kv = jnp.full((n,), kind, jnp.int32)
    u = jax.random.uniform(jax.random.key(seed), (n, 2))
    wh = np.asarray(mf.sample_wh(kv, wo, axv, ayv, u))
    assert np.all(np.isfinite(wh))
    # sampled support is the upper hemisphere facing wo
    assert np.all(np.sum(np.asarray(wo) * wh, -1) > -1e-5)

    # uniform hemisphere MC of the analytic pdf, same bins
    v = np.array(jax.random.normal(jax.random.key(seed + 1), (n, 3)))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v[:, 2] = np.abs(v[:, 2])
    pv = np.asarray(mf.pdf_wh(kv, wo, jnp.asarray(v), axv, ayv))
    pv = pv * (np.sum(np.asarray(wo) * v, -1) > 0)  # sampler support

    edges = np.linspace(0.0, 1.0, nbins + 1)
    got = np.histogram(wh[:, 2], edges)[0] / n
    # d(area) = 2*pi per unit cos on the hemisphere / (2*pi) uniform pdf
    want = np.array([
        pv[(v[:, 2] >= lo) & (v[:, 2] < hi)].sum() for lo, hi in
        zip(edges[:-1], edges[1:])
    ]) * (2 * np.pi / n)
    # normalization: \int p_vis = 1 (up to uniform-MC noise — the peak bin
    # is undersampled by a uniform estimator)
    assert abs(want.sum() - 1.0) < 0.03, want.sum()
    np.testing.assert_allclose(got, want / want.sum(), atol=8e-3)


def test_beckmann_vndf_histogram_matches_pdf():
    _histogram_matches_pdf(mf.BECKMANN, 0.3, 0.3, woz=0.6, seed=10)


def test_beckmann_vndf_anisotropic_grazing():
    _histogram_matches_pdf(mf.BECKMANN, 0.15, 0.5, woz=0.25, seed=11)


def test_ggx_vndf_histogram_matches_pdf():
    _histogram_matches_pdf(mf.GGX, 0.3, 0.3, woz=0.6, seed=12)


def test_beckmann_microfacet_sample_eval_pdf_consistent():
    n = 50_000
    lobe = const_lobe(
        B.LOBE_MICROFACET, n,
        a0=jnp.full((n,), 0.35), a1=jnp.full((n,), 0.35),
        fr_conductor=jnp.ones((n,), bool),
        f1=jnp.ones((n, 3)) * 0.2, f2=jnp.ones((n, 3)) * 3.0,
        mf_kind=jnp.full((n,), mf.BECKMANN, jnp.int32),
    )
    wo = wo_batch(n, z=0.5)
    u = jax.random.uniform(jax.random.key(14), (n, 2))
    s = B.sample(lobe, wo, u)
    ok = np.asarray(s.pdf) > 0
    assert ok.mean() > 0.9
    f_eval = np.asarray(B.eval_f(lobe, wo, s.wi))
    p_eval = np.asarray(B.pdf(lobe, wo, s.wi))
    assert np.allclose(f_eval[ok], np.asarray(s.f)[ok], rtol=2e-3, atol=1e-5)
    assert np.allclose(p_eval[ok], np.asarray(s.pdf)[ok], rtol=2e-3, atol=1e-5)


def test_phong_sample_histogram_matches_pdf():
    """Phong cosine-lobe sampling vs its analytic pdf, binned about the
    mirror direction (reference: src/bsdf.h:590-628)."""
    n = 400_000
    expn = 25.0
    lobe = const_lobe(B.LOBE_PHONG, n, a0=jnp.full((n,), expn))
    wo = wo_batch(n, z=0.7)
    u = jax.random.uniform(jax.random.key(15), (n, 2))
    s = B.sample(lobe, wo, u)
    wi = np.asarray(s.wi)
    wr = np.asarray([-float(wo[0, 0]), 0.0, float(wo[0, 2])])
    cos_a = wi @ wr
    # pdf about the mirror axis: (e+1)/(2pi) cos^e — its cos-marginal CDF is
    # cos^(e+1); check quantiles (some samples fall below the horizon and
    # keep pdf but are clipped by the hemisphere — restrict to interior bins)
    got = np.quantile(cos_a[cos_a > 0], [0.5, 0.8, 0.95])
    want = np.array([q ** (1.0 / (expn + 1.0)) for q in (0.5, 0.8, 0.95)])
    np.testing.assert_allclose(got, want, atol=6e-3)
    # sample/eval/pdf consistency
    ok = np.asarray(s.pdf) > 0
    f_eval = np.asarray(B.eval_f(lobe, wo, s.wi))
    p_eval = np.asarray(B.pdf(lobe, wo, s.wi))
    assert np.allclose(f_eval[ok], np.asarray(s.f)[ok], rtol=2e-3, atol=1e-5)
    assert np.allclose(p_eval[ok], np.asarray(s.pdf)[ok], rtol=2e-3, atol=1e-5)


def test_phong_energy_conserving():
    r"""rho = Ks (e+2)/(2pi) \int cos^e <= Ks (reference bsdf.h:555 comment:
    physically based / energy conserving)."""
    n = 300_000
    lobe = const_lobe(B.LOBE_PHONG, n, f0=jnp.ones((n, 3)),
                      a0=jnp.full((n,), 8.0))
    wo = wo_batch(n, z=0.9)
    u = jax.random.uniform(jax.random.key(16), (n, 2))
    s = B.sample(lobe, wo, u)
    est = np.asarray(
        s.f * jnp.abs(s.wi[:, 2:3]) / jnp.maximum(s.pdf, 1e-9)[:, None]
    )
    mean = est.mean(0)
    assert np.all(mean > 0.1) and np.all(mean <= 1.005), mean


def test_make_lobe_phong_and_beckmann_wiring():
    """Builder -> pack -> gather -> make_lobe plumbing for the round-2
    material kinds."""
    from jet_pbrt_tpu.scene.builder import SceneBuilder
    from jet_pbrt_tpu.scene import pack as P

    b = SceneBuilder("wiring")
    b.set_camera((0, 0, 3), lookat=(0, 0, 0))
    b.add_phong((0.5, 0.6, 0.7), 42.0)
    b.add_metal((0.2, 0.9, 1.1), (3.9, 2.4, 2.1), 0.3, 0.3,
                distribution="beckmann")
    m = b.add_matte((0.5, 0.5, 0.5))
    b.add_sphere((0, 0, 0), 1.0, m)
    b.add_point_light((0, 2, 0), (5, 5, 5))
    s = b.build(use_bvh=False)
    assert B.LOBE_PHONG in s.meta.present_lobes
    kind, c0, c1, s0, s1, remap, tex, mfk = P.gather_material(
        s.pack, jnp.array([0, 1, 2]))
    lobe = B.make_lobe(kind, c0, c1, s0, s1, remap,
                       jnp.zeros((3,)), mf_kind=mfk)
    assert int(lobe.kind[0]) == B.LOBE_PHONG
    assert float(lobe.a0[0]) == 42.0
    assert int(lobe.mf_kind[1]) == mf.BECKMANN
    assert int(lobe.kind[1]) == B.LOBE_MICROFACET
    assert int(lobe.mf_kind[2]) == mf.GGX


def test_mf_kind_pruning_compiles_single_branch():
    """A GGX-only scene must compile NO Beckmann erf/erfinv chain and a
    Beckmann-only scene no... well, Beckmann's lambda uses erf too — the
    discriminating op is erf_inv, which only the Beckmann VNDF inversion
    loop emits (10 fixed iterations per lane). Checked on the jaxpr
    (VERDICT r3 task 9)."""
    import jax
    import jax.numpy as jnp
    from jet_pbrt_tpu.ops import bsdf as B
    from jet_pbrt_tpu.ops import microfacet as mf

    n = 8
    lobe = B.Lobe(
        kind=jnp.full((n,), B.LOBE_MICROFACET, jnp.int32),
        f0=jnp.ones((n, 3)), f1=jnp.ones((n, 3)), f2=jnp.ones((n, 3)),
        a0=jnp.full((n,), 0.2), a1=jnp.full((n,), 0.2),
        fr_conductor=jnp.ones((n,), bool),
        fr_eta_i=jnp.ones((n,)), fr_eta_t=jnp.full((n,), 1.5),
        mf_kind=jnp.full((n,), mf.GGX, jnp.int32),
    )
    wo = jnp.tile(jnp.asarray([[0.2, 0.1, 0.95]]), (n, 1))
    u = jnp.full((n, 2), 0.4)

    def f_pruned(lobe, wo, u):
        return B.sample(lobe, wo, u, lobes=(B.LOBE_MICROFACET,),
                        mf_kinds=(mf.GGX,))

    def f_full(lobe, wo, u):
        return B.sample(lobe, wo, u, lobes=(B.LOBE_MICROFACET,))

    jx_pruned = str(jax.make_jaxpr(f_pruned)(lobe, wo, u))
    jx_full = str(jax.make_jaxpr(f_full)(lobe, wo, u))
    assert "erf_inv" not in jx_pruned
    assert "erf_inv" in jx_full
    # and the pruned path still samples identically on GGX lanes
    a = f_pruned(lobe, wo, u)
    b = f_full(lobe, wo, u)
    np.testing.assert_allclose(np.asarray(a.wi), np.asarray(b.wi), rtol=1e-6)
