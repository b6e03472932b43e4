"""Noise schedules and samplers.

TPU-native equivalents of the diffusers schedulers the reference leans on:
- `DDPMSchedule` — the training-time noising schedule
  (reference: trainer/models.py:32 builds DDPMScheduler from the pipe config;
  trainer/main.py:326 calls add_noise; trainer/loss.py:83-106 computes SNR from
  its alphas_cumprod).
- `EulerDiscreteSampler` — validation-time sampling with "trailing" timestep
  spacing (reference: trainer/inference.py:358-360 swaps an
  EulerDiscreteScheduler in for rendering).

Everything is a frozen pytree of precomputed tables so the functions trace
cleanly under jit: timesteps index into tables with `take`, no python control
flow on traced values.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _broadcast_to_sample(coeffs: jnp.ndarray, sample_ndim: int) -> jnp.ndarray:
    """Reshape per-batch coefficients [B] -> [B, 1, 1, ...] to match a sample."""
    return coeffs.reshape(coeffs.shape + (1,) * (sample_ndim - 1))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Training noise schedule (scaled-linear betas, the SD default).

    Matches diffusers' DDPMScheduler(beta_start=0.00085, beta_end=0.012,
    beta_schedule="scaled_linear", num_train_timesteps=1000) which is what
    single-file SD1.5/SDXL checkpoints configure.
    """

    alphas_cumprod: jnp.ndarray  # [T] float32
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "epsilon",
    ) -> "DDPMSchedule":
        if beta_schedule == "scaled_linear":
            betas = (
                jnp.linspace(
                    beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=jnp.float64
                    if jax.config.jax_enable_x64 else jnp.float32,
                )
                ** 2
            )
        elif beta_schedule == "linear":
            betas = jnp.linspace(beta_start, beta_end, num_train_timesteps, dtype=jnp.float32)
        else:
            raise ValueError(f"Unknown beta_schedule: {beta_schedule}")
        alphas_cumprod = jnp.cumprod(1.0 - betas.astype(jnp.float32), axis=0)
        return cls(
            alphas_cumprod=alphas_cumprod,
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
        )

    def sqrt_alpha_sigma(self, timesteps: jnp.ndarray):
        """Return (sqrt(ᾱ_t), sqrt(1-ᾱ_t)) per batch element, float32."""
        ac = jnp.take(self.alphas_cumprod, timesteps)
        return jnp.sqrt(ac), jnp.sqrt(1.0 - ac)

    def add_noise(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """x_t = sqrt(ᾱ_t)·x_0 + sqrt(1-ᾱ_t)·ε  (reference: main.py:326)."""
        sqrt_alpha, sqrt_sigma = self.sqrt_alpha_sigma(timesteps)
        sqrt_alpha = _broadcast_to_sample(sqrt_alpha, sample.ndim).astype(sample.dtype)
        sqrt_sigma = _broadcast_to_sample(sqrt_sigma, sample.ndim).astype(sample.dtype)
        return sqrt_alpha * sample + sqrt_sigma * noise

    def get_velocity(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """v_t = sqrt(ᾱ_t)·ε - sqrt(1-ᾱ_t)·x_0 (v-prediction target)."""
        sqrt_alpha, sqrt_sigma = self.sqrt_alpha_sigma(timesteps)
        sqrt_alpha = _broadcast_to_sample(sqrt_alpha, sample.ndim).astype(sample.dtype)
        sqrt_sigma = _broadcast_to_sample(sqrt_sigma, sample.ndim).astype(sample.dtype)
        return sqrt_alpha * noise - sqrt_sigma * sample

    def compute_snr(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        """SNR(t) = ᾱ_t / (1-ᾱ_t)  (reference: trainer/loss.py:83-106)."""
        ac = jnp.take(self.alphas_cumprod, timesteps)
        return ac / (1.0 - ac)


@dataclasses.dataclass(frozen=True)
class EulerDiscreteSampler:
    """Euler-discrete sampler with "trailing" timestep spacing.

    The reference renders validation images by swapping an
    EulerDiscreteScheduler(timestep_spacing="trailing") into the pipeline
    (trainer/inference.py:358-360). This reimplements that sampler as a
    scan-friendly pure function.
    """

    schedule: DDPMSchedule

    def sigmas_and_timesteps(self, num_inference_steps: int):
        """Trailing spacing: t_i = round(T - (i+1)·T/N), descending."""
        T = self.schedule.num_train_timesteps
        step_ratio = T / num_inference_steps
        # trailing: arange(T, 0, -step_ratio).round() - 1, descending
        timesteps = (jnp.arange(T, 0, -step_ratio)).round().astype(jnp.int32) - 1
        ac = jnp.take(self.schedule.alphas_cumprod, timesteps)
        sigmas = jnp.sqrt((1.0 - ac) / ac)
        sigmas = jnp.concatenate([sigmas, jnp.zeros((1,), sigmas.dtype)])
        return sigmas, timesteps

    def init_noise_sigma(self, num_inference_steps: int) -> jnp.ndarray:
        sigmas, _ = self.sigmas_and_timesteps(num_inference_steps)
        return jnp.sqrt(sigmas[0] ** 2 + 1.0)

    @staticmethod
    def scale_model_input(sample: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
        return sample / jnp.sqrt(sigma**2 + 1.0).astype(sample.dtype)

    def step(
        self,
        model_output: jnp.ndarray,
        sigma: jnp.ndarray,
        sigma_next: jnp.ndarray,
        sample: jnp.ndarray,
    ) -> jnp.ndarray:
        """One deterministic Euler step x_{i+1} = x_i + (σ_{i+1} - σ_i)·d."""
        if self.schedule.prediction_type == "epsilon":
            pred_original = sample - sigma.astype(sample.dtype) * model_output
        elif self.schedule.prediction_type == "v_prediction":
            # x0 = x/(σ²+1) - v·σ/sqrt(σ²+1)
            pred_original = sample / (sigma**2 + 1.0) - model_output * (
                sigma / jnp.sqrt(sigma**2 + 1.0)
            ).astype(sample.dtype)
        else:
            raise ValueError(f"Unknown prediction type {self.schedule.prediction_type}")
        derivative = (sample - pred_original) / sigma.astype(sample.dtype)
        return sample + (sigma_next - sigma).astype(sample.dtype) * derivative
