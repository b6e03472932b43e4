"""Numeric tests for the DDPM schedule and Euler sampler against golden values
computed from the closed-form definitions (the same math diffusers implements;
reference relies on DDPMScheduler/EulerDiscreteScheduler, trainer/models.py:32,
trainer/inference.py:358-360)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_lora_trainer_tpu.diffusion.schedulers import DDPMSchedule, EulerDiscreteSampler


def _numpy_alphas_cumprod(T=1000, b0=0.00085, b1=0.012):
    betas = np.linspace(b0**0.5, b1**0.5, T, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def test_alphas_cumprod_matches_closed_form():
    sched = DDPMSchedule.create()
    ref = _numpy_alphas_cumprod()
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), ref, rtol=2e-5)
    # SD-known endpoint values
    assert 0.9985 < float(sched.alphas_cumprod[0]) < 0.99917
    assert float(sched.alphas_cumprod[-1]) < 0.005


def test_add_noise_matches_formula():
    sched = DDPMSchedule.create()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 4, 4))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 4, 4))
    t = jnp.array([10, 500])
    noisy = sched.add_noise(x, eps, t)
    ac = np.asarray(sched.alphas_cumprod)
    for i, ti in enumerate([10, 500]):
        expected = np.sqrt(ac[ti]) * np.asarray(x[i]) + np.sqrt(1 - ac[ti]) * np.asarray(eps[i])
        np.testing.assert_allclose(np.asarray(noisy[i]), expected, rtol=1e-5, atol=1e-6)


def test_velocity_identity():
    """v-target and epsilon-target must satisfy x_t = a x0 + s eps and
    v = a eps - s x0, so a*x_t... sanity: recombining recovers eps."""
    sched = DDPMSchedule.create()
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 2, 2, 4))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 2, 4))
    t = jnp.array([250])
    v = sched.get_velocity(x, eps, t)
    a, s = sched.sqrt_alpha_sigma(t)
    recovered_eps = a * v + s * sched.add_noise(x, eps, t)
    np.testing.assert_allclose(np.asarray(recovered_eps), np.asarray(eps), rtol=1e-4, atol=1e-5)


def test_snr_formula():
    sched = DDPMSchedule.create()
    t = jnp.array([0, 100, 999])
    snr = np.asarray(sched.compute_snr(t))
    ac = _numpy_alphas_cumprod()
    np.testing.assert_allclose(snr, ac[[0, 100, 999]] / (1 - ac[[0, 100, 999]]), rtol=1e-4)


def test_euler_trailing_timesteps():
    sampler = EulerDiscreteSampler(DDPMSchedule.create())
    sigmas, timesteps = sampler.sigmas_and_timesteps(4)
    # trailing spacing for T=1000, N=4: [999, 749, 499, 249]
    np.testing.assert_array_equal(np.asarray(timesteps), [999, 749, 499, 249])
    assert float(sigmas[-1]) == 0.0
    assert np.all(np.diff(np.asarray(sigmas)) < 0)  # strictly decreasing


def test_euler_step_denoises_perfect_prediction():
    """With a model that predicts the true noise, one Euler step moves the
    sample exactly along x = x0 + sigma*eps toward x0."""
    sched = DDPMSchedule.create()
    sampler = EulerDiscreteSampler(sched)
    sigmas, _ = sampler.sigmas_and_timesteps(2)
    key = jax.random.PRNGKey(7)
    x0 = jax.random.normal(key, (1, 2, 2, 4))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 2, 4))
    x = x0 + sigmas[0] * eps
    x_next = sampler.step(eps, sigmas[0], sigmas[1], x)
    np.testing.assert_allclose(
        np.asarray(x_next), np.asarray(x0 + sigmas[1] * eps), rtol=1e-4, atol=1e-5
    )
    # stepping to sigma=0 recovers x0 exactly
    x_final = sampler.step(eps, sigmas[1], sigmas[2], x_next)
    np.testing.assert_allclose(np.asarray(x_final), np.asarray(x0), rtol=1e-4, atol=1e-5)
