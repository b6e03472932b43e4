"""Tests for the experimental distribution losses and multi-concept dataset
merging (both dead/broken in the reference; working here)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sd_lora_trainer_tpu.data.io import merge_datasets
from sd_lora_trainer_tpu.diffusion.experimental_losses import (
    DifferentiableHistogram,
    GaussianKDE,
)


def test_kde_scores_higher_near_data():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (200, 4)) * 0.1
    kde = GaussianKDE(x, bw=0.2)
    near = kde.score_samples(jnp.zeros((1, 4)))
    far = kde.score_samples(jnp.ones((1, 4)) * 5.0)
    assert float(near[0]) > float(far[0])
    assert np.isfinite(float(kde.log_prob(x[:10])))


def test_kde_sampling_tracks_distribution():
    x = jnp.concatenate([jnp.full((100, 2), -3.0), jnp.full((100, 2), 3.0)])
    kde = GaussianKDE(x, bw=0.1)
    samples = kde.sample(jax.random.PRNGKey(1), 500)
    assert abs(float(jnp.abs(samples).mean()) - 3.0) < 0.3  # bimodal +-3


def test_histogram_nll_direction():
    x = jax.random.normal(jax.random.PRNGKey(2), (2000,)) * 0.014
    hist = DifferentiableHistogram(x, bins=64)
    nll_in = float(hist(jax.random.normal(jax.random.PRNGKey(3), (200,)) * 0.014))
    nll_out = float(hist(jnp.full((200,), 0.2)))
    assert nll_in < nll_out


def test_histogram_is_differentiable():
    x = jax.random.normal(jax.random.PRNGKey(4), (500,))
    hist = DifferentiableHistogram(x, bins=32)
    g = jax.grad(lambda y: hist(y))(jnp.ones((50,)) * 0.5)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def _make_dataset(root, n, caption):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    rows = []
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(f"{root}/{i}.src.jpg")
        Image.fromarray(np.full((16, 16), 255, np.uint8)).save(f"{root}/{i}.mask.jpg")
        rows.append(f"{i}.src.jpg,{i}.mask.jpg,\"{caption} {i}\"")
    with open(f"{root}/captions.csv", "w") as f:
        f.write("image_path,mask_path,caption\n" + "\n".join(rows))


def test_merge_datasets_balances_and_retokens(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _make_dataset(a, 2, "TOK photo")
    _make_dataset(b, 5, "TOK painting")
    out = merge_datasets([a, b], str(tmp_path / "merged"), token_names=["<c0>", "<c1>"])
    import pandas as pd

    df = pd.read_csv(os.path.join(out, "captions.csv"))
    # balanced: both concepts duplicated up to max(2, 5) = 5 rows each
    assert len(df) == 10
    assert (df["caption"].str.contains("<c0>")).sum() == 5
    assert (df["caption"].str.contains("<c1>")).sum() == 5
    assert not df["caption"].str.contains("TOK").any()
    for p in df["image_path"]:
        assert os.path.exists(os.path.join(out, p))
