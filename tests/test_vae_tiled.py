"""Tiled VAE decode (models/vae.py:vae_decode_tiled).

The tiling exists so validation renders can decode the whole batch at 1024px
(a plain batch-4 decode OOMs 16G HBM — BENCH_NOTES.md round-2). Functional
contract: identical to `vae_decode` when one tile covers the latent; within
blend tolerance of the untiled decode otherwise (seams only differ where conv
receptive fields / group-norm statistics cross tile borders).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sd_lora_trainer_tpu.models.vae import (
    VAEConfig,
    init_vae_params,
    vae_decode,
    vae_decode_tiled,
)

CFG = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)


def _params():
    return init_vae_params(jax.random.PRNGKey(0), CFG)


def test_single_tile_exactly_matches_untiled():
    params = _params()
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4)) * 0.5
    full = vae_decode(params, z, CFG)
    tiled = vae_decode_tiled(params, z, CFG, tile=16, overlap=8)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(tiled))


def test_tiled_close_to_untiled():
    """Tiled deviates from untiled only through (a) conv zero-padding at tile
    borders — blended out by the overlap ramps — and (b) group-norm statistics
    computed per tile instead of globally (inherent to tiled VAE decoding,
    diffusers included). With RANDOM-init weights (b) is far noisier than on a
    trained decoder, so the bound is a loose fraction of the output dynamic
    range; on real weights seams are visually invisible."""
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4)
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    # smooth latent: every tile sees similar content/statistics
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, 48), jnp.linspace(-1, 1, 48), indexing="ij")
    z = jnp.stack([yy, xx, yy * xx, 0.3 * jnp.ones_like(yy)], -1)[None] * 0.4
    full = np.asarray(vae_decode(params, z, cfg))
    tiled = np.asarray(vae_decode_tiled(params, z, cfg, tile=32, overlap=16))
    assert tiled.shape == full.shape == (1, 96, 96, 3)
    err = np.abs(tiled - full)
    dyn_range = full.max() - full.min()
    assert err.mean() / dyn_range < 0.05, (err.mean(), dyn_range)
    assert np.isfinite(tiled).all()


def test_tiled_covers_whole_canvas():
    """Every output pixel gets nonzero blend weight (no holes), including the
    clipped last-tile positions of non-multiple sizes."""
    params = _params()
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 24, 40, 4)) * 0.3
    out = np.asarray(vae_decode_tiled(params, z, CFG, tile=16, overlap=8))
    assert out.shape == (1, 48, 80, 3)
    assert np.isfinite(out).all()


def test_tiled_decode_jits_batched():
    """The validation-render usage: one jitted call over the full batch."""
    params = _params()
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 32, 32, 4)) * 0.3
    f = jax.jit(lambda zz: vae_decode_tiled(params, zz, CFG, tile=16, overlap=8))
    out = np.asarray(f(z))
    assert out.shape == (4, 64, 64, 3)
    assert np.isfinite(out).all()


def test_batched_decode_exact_and_chunked():
    """vae_decode_batched computes the SAME math as plain decode (it only
    chunks the batch; no spatial tiling, no group-norm statistic changes) —
    differences are XLA scheduling noise between batch shapes, orders of
    magnitude below tiled-decode seam error."""
    from sd_lora_trainer_tpu.models.vae import vae_decode_batched

    params = _params()
    z = jax.random.normal(jax.random.PRNGKey(5), (5, 16, 16, 4)) * 0.3
    full = vae_decode(params, z, CFG)
    # max_latent_px = 2 images per chunk -> 3 chunks with padding
    chunked = vae_decode_batched(params, z, CFG, max_latent_px=2 * 16 * 16)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), rtol=1e-4, atol=1e-6
    )

    # single image over budget -> falls back to spatial tiling (inexact but
    # finite and correctly shaped)
    big = jax.random.normal(jax.random.PRNGKey(6), (2, 48, 48, 4)) * 0.3
    out = vae_decode_batched(params, big, CFG, max_latent_px=32 * 32)
    assert out.shape == (2, 96, 96, 3)
    assert np.isfinite(np.asarray(out)).all()
