"""Experimental distribution losses (reference: trainer/loss.py:311-436).

The reference carries a torch GaussianKDE and a DifferentiableHistogram that
are marked experimental/unused ("TODO fix this function"); these are their
working JAX equivalents, kept out of the training path exactly like upstream
— available for embedding-distribution regularization experiments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class GaussianKDE:
    """Kernel density estimate over points X [n, d] with bandwidth `bw`
    (reference: trainer/loss.py:316-380). Pure-functional scoring."""

    def __init__(self, x: jnp.ndarray, bw: float = 0.1):
        self.x = x.astype(jnp.float32)
        self.bw = bw
        self.n, self.dims = x.shape

    def _log_kernel(self, diff: jnp.ndarray) -> jnp.ndarray:
        """log N(diff; 0, I) for standardized distances [..., d]."""
        return -0.5 * jnp.sum(diff**2, axis=-1) - 0.5 * self.dims * jnp.log(2 * jnp.pi)

    def score_samples(self, y: jnp.ndarray) -> jnp.ndarray:
        """log density at each point of y [m, d]."""
        y = y.astype(jnp.float32)
        diff = (self.x[:, None, :] - y[None, :, :]) / self.bw  # [n, m, d]
        log_k = self._log_kernel(diff)  # [n, m]
        # log( (1/(n*bw^d)) * sum_i K(...) )
        return jax.nn.logsumexp(log_k, axis=0) - jnp.log(self.n) - self.dims * jnp.log(self.bw)

    def log_prob(self, y: jnp.ndarray) -> jnp.ndarray:
        """Total log probability of y under the KDE."""
        return jnp.sum(self.score_samples(y))

    def sample(self, key: jax.Array, num_samples: int) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (num_samples,), 0, self.n)
        centers = self.x[idx]
        return centers + self.bw * jax.random.normal(k2, centers.shape)


class DifferentiableHistogram:
    """Soft (Gaussian-smoothed) histogram PDF with NLL scoring — the working
    version of the reference's broken DifferentiableHistogram
    (trainer/loss.py:383-436)."""

    def __init__(
        self,
        x: jnp.ndarray,
        bins: int = 64,
        min_range: float | None = None,
        max_range: float | None = None,
        bandwidth: float = 0.02,
    ):
        x = x.astype(jnp.float32).ravel()
        self.bandwidth = bandwidth * (float(x.max()) - float(x.min()) + 1e-12)
        lo = float(x.min()) if min_range is None else min_range
        hi = float(x.max()) if max_range is None else max_range
        edges = jnp.linspace(lo, hi, bins + 1)
        self.bin_centers = (edges[:-1] + edges[1:]) / 2.0
        dist = (x[:, None] - self.bin_centers[None, :]) / self.bandwidth
        weights = jnp.exp(-0.5 * dist**2)
        hist = weights.sum(axis=0)
        self.pdf = hist / hist.sum()

    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        """Negative log likelihood of sample y under the smoothed PDF."""
        y = y.astype(jnp.float32).ravel()
        dist = (y[:, None] - self.bin_centers[None, :]) / self.bandwidth
        weights = jnp.exp(-0.5 * dist**2)
        likelihoods = (self.pdf[None, :] * weights).sum(axis=1)
        return -jnp.log(likelihoods + 1e-12).mean()
