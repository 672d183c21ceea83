"""Analytic-stub tests: the sampler recursion and guidance mean-shift match
the DDPM equations exactly (no neural nets involved)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.diffusion import LatentDiffusion, KnowledgeAlignment, core
from prediff_tpu.diffusion.schedule import make_gaussian_schedule


LAT = (2, 4, 4, 2)


def _linear_align(c, guide, T=4):
    """Alignment with an analytically known mean shift, built through the
    SUPPORTED surface (apply_fn — the reference's alignment_fn, sevir.py:55):
    apply_fn returns m = c*sum(z) replicated over (B,T,1); the module's own
    mean/sq/sqrt tail then yields (avg_x_gt = 0)

        E = sqrt((m - 0)^2 + eps) ~= |m|,   dE/dz = sign(m) * c

    so get_mean_shift == guide * c * sign(sum(z)) everywhere (eps = 1e-24 is
    ~23 orders below the m^2 these tests produce)."""
    return KnowledgeAlignment(
        params={}, guide_scale=guide,
        apply_fn=lambda v, zt, t, zc=None, y=None:
            c * jnp.sum(zt) * jnp.ones((zt.shape[0], T, 1), zt.dtype))


def make_stub_ld(timesteps=6, alignment=None, eps_value=0.0):
    """LatentDiffusion whose 'UNet' predicts a constant eps and whose 'VAE'
    is the identity (latent == pixel)."""

    def unet_apply(variables, z, t, zc, **kw):
        return jnp.full_like(z, eps_value)

    def vae_encode(variables, frames):  # moments = (mean | logvar=-inf-ish)
        return jnp.concatenate([frames, jnp.full_like(frames, -30.0)], axis=-1)

    def vae_decode(variables, frames):
        return frames

    return LatentDiffusion(
        unet_apply=unet_apply,
        vae_apply_encode=vae_encode,
        vae_apply_decode=vae_decode,
        timesteps=timesteps,
        data_shape=LAT,
        latent_shape=LAT,
        cond_latent_shape=LAT,
        alignment=alignment,
    )


def manual_ddpm_chain(schedule, x_T, eps_value, rng, batch_size):
    """Hand-rolled reference recursion using the registered buffers."""
    z = x_T
    _, rng_loop = jax.random.split(rng)
    for t in range(schedule.num_timesteps - 1, -1, -1):
        t_b = jnp.full((batch_size,), t, jnp.int32)
        eps = jnp.full_like(z, eps_value)
        z0 = core.predict_start_from_noise(schedule, z, t_b, eps)
        mean, _, logv = core.q_posterior(schedule, z0, z, t_b)
        step_rng = jax.random.fold_in(rng_loop, t)
        noise = jax.random.normal(step_rng, z.shape, z.dtype)
        nz = 1.0 if t > 0 else 0.0
        z = mean + nz * jnp.exp(0.5 * logv) * noise
    return z


def test_sampler_matches_manual_recursion():
    ld = make_stub_ld(eps_value=0.3)
    rng = jax.random.PRNGKey(5)
    y = jnp.zeros((1,) + LAT)
    got = ld.sample(None, None, rng, y, return_decoded=False)
    # reproduce x_T generation exactly like sample_fn does
    rng_init, rng_loop_parent = jax.random.split(rng)
    x_T = jax.random.normal(rng_init, (1,) + LAT, jnp.float32)
    expected = manual_ddpm_chain(ld.schedule, x_T, 0.3, rng, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_guidance_mean_shift_analytic():
    """An apply_fn returning m = c*sum(z) (replicated over T) drives the
    module's own sq/sqrt tail to E = sqrt((m-0)^2 + eps) ~= |m|, whose
    gradient is sign(m)*c everywhere — so each guided step's mean shifts by
    exactly -exp(0.5 logvar) * guide_scale * c * sign(sum(z)).  (Round 5:
    the analytic alignment is crafted through the SUPPORTED surface —
    apply_fn, the reference's alignment_fn — because get_mean_shift now
    differentiates the pre-psum squared error, not alignment_energy.)"""
    c = 0.07
    guide = 3.0

    align = _linear_align(c, guide)
    zt = jnp.asarray(np.random.RandomState(0).randn(1, *LAT).astype(np.float32))
    s = float(np.sign(np.asarray(zt).sum()))
    shift = align.get_mean_shift(zt, jnp.array([2]), jnp.zeros((1, 1)))
    np.testing.assert_allclose(np.asarray(shift), guide * c * s, rtol=1e-6)
    c = c * s  # the effective constant-gradient magnitude below

    # and through p_sample: guided mean == unguided mean - exp(.5 logv)*shift
    ld = make_stub_ld(alignment=align)
    sch = ld.schedule
    t_b = jnp.array([3])
    z = zt
    eps = jnp.zeros_like(z)
    z0 = core.predict_start_from_noise(sch, z, t_b, eps)
    mean, _, logv = core.q_posterior(sch, z0, z, t_b)
    rng = jax.random.PRNGKey(0)
    unguided = ld._p_sample_step(None, {}, z, t_b, None, None, jnp.zeros((1, 1)),
                                 rng, use_alignment=False)
    guided = ld._p_sample_step(None, {}, z, t_b, None, None, jnp.zeros((1, 1)),
                               rng, use_alignment=True)
    np.testing.assert_allclose(
        np.asarray(unguided - guided),
        np.asarray(jnp.exp(0.5 * logv) * guide * c * jnp.ones_like(z)),
        rtol=1e-4, atol=1e-6,
    )


def test_eps_zero_sampler_contracts_to_zero_mean():
    """With eps-prediction == 0, z0_pred = z_t / sqrt(abar_t): the chain stays
    finite and centred (statistical sanity of the recursion)."""
    ld = make_stub_ld(timesteps=20, eps_value=0.0)
    rng = jax.random.PRNGKey(1)
    y = jnp.zeros((4,) + LAT)
    out = ld.sample(None, None, rng, y, return_decoded=False)
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    assert abs(arr.mean()) < 0.5


def test_guidance_every_k_semantics():
    """guidance_every_k (round-4, VERDICT r3 #6 opt-in): with a linear
    energy (constant gradient c), each GUIDED step's mean shifts by
    k * exp(.5 logv) * guide_scale * c and the skipped steps match the
    unguided step exactly; k=1 is the reference behavior bit-for-bit."""
    c, guide = 0.07, 3.0

    align = _linear_align(c, guide)
    ld = make_stub_ld(alignment=align)
    sch = ld.schedule
    z = jnp.asarray(np.random.RandomState(1).randn(1, *LAT).astype(np.float32))
    c = c * float(np.sign(np.asarray(z).sum()))  # effective gradient
    rng = jax.random.PRNGKey(0)
    gt = jnp.zeros((1, 1))
    k = 3
    for t in (0, 1, 2, 3, 4):
        t_b = jnp.array([t])
        base = ld._p_sample_step(None, {}, z, t_b, None, None, gt, rng,
                                 use_alignment=False)
        k1 = ld._p_sample_step(None, {}, z, t_b, None, None, gt, rng,
                               use_alignment=True, guidance_every_k=1)
        kk = ld._p_sample_step(None, {}, z, t_b, None, None, gt, rng,
                               use_alignment=True, guidance_every_k=k)
        _, _, logv = core.q_posterior(
            sch, core.predict_start_from_noise(sch, z, t_b, jnp.zeros_like(z)),
            z, t_b)
        shift1 = jnp.exp(0.5 * logv) * guide * c
        np.testing.assert_allclose(np.asarray(base - k1), np.asarray(
            shift1 * jnp.ones_like(z)), rtol=1e-4, atol=1e-6)
        if t % k == 0:  # guided step: k-scaled shift
            np.testing.assert_allclose(np.asarray(base - kk), np.asarray(
                k * shift1 * jnp.ones_like(z)), rtol=1e-4, atol=1e-6)
        else:  # skipped step: exactly the unguided update
            np.testing.assert_array_equal(np.asarray(kk), np.asarray(base))

    # end-to-end: k=1 == the plain guided chain; guide_scale=0 makes k moot
    y = jnp.zeros((1,) + LAT)
    g_k1 = ld.sample(None, None, rng, y, use_alignment=True,
                     alignment_kwargs={"avg_x_gt": gt}, return_decoded=False,
                     guidance_every_k=1)
    g_ref = ld.sample(None, None, rng, y, use_alignment=True,
                      alignment_kwargs={"avg_x_gt": gt}, return_decoded=False)
    np.testing.assert_array_equal(np.asarray(g_k1), np.asarray(g_ref))
    g_k2 = ld.sample(None, None, rng, y, use_alignment=True,
                     alignment_kwargs={"avg_x_gt": gt}, return_decoded=False,
                     guidance_every_k=2)
    assert (np.asarray(g_k2) != np.asarray(g_k1)).any()
    zero = _linear_align(0.05, guide=0.0)
    ld0 = make_stub_ld(alignment=zero)
    u = ld0.sample(None, None, rng, y, return_decoded=False)
    for kk_ in (1, 2):
        gk = ld0.sample(None, None, rng, y, use_alignment=True,
                        alignment_kwargs={"avg_x_gt": gt},
                        return_decoded=False, guidance_every_k=kk_)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(u),
                                   rtol=1e-6, atol=1e-7)


def test_guidance_every_k_ddim():
    """DDIM path: idx % k gating, k=1 == reference, scale=0 == unguided."""
    c, guide = 0.05, 2.0

    align = _linear_align(c, guide)
    ld = make_stub_ld(timesteps=8, alignment=align)
    y = jnp.zeros((1,) + LAT)
    rng = jax.random.PRNGKey(3)
    gt = jnp.zeros((1, 1))
    kw = dict(use_alignment=True, alignment_kwargs={"avg_x_gt": gt},
              return_decoded=False, sampler="ddim", ddim_steps=4)
    g1 = ld.sample(None, None, rng, y, **kw)
    g1b = ld.sample(None, None, rng, y, guidance_every_k=1, **kw)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g1b))
    g2 = ld.sample(None, None, rng, y, guidance_every_k=2, **kw)
    assert np.isfinite(np.asarray(g2)).all()
    assert (np.asarray(g2) != np.asarray(g1)).any()
