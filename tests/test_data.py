"""Data pipeline tests: bucketing (incl. rank sharding), latent dataset,
preprocess geometry."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from sd_lora_trainer_tpu.data.bucketing import BucketPlan, generate_resolutions
from sd_lora_trainer_tpu.data.dataset import BucketStore, EpochSampler, LatentDataset
from sd_lora_trainer_tpu.data.preprocess import (
    calculate_new_dimensions,
    center_of_mass,
    crop_to_aspect_ratio,
    grow_mask,
    round_to_nearest_multiple,
)
from sd_lora_trainer_tpu.models.synthesize import TINY_VAE_CONFIG
from sd_lora_trainer_tpu.models.vae import init_vae_params


def test_generate_resolutions_divisible_and_budget():
    res = generate_resolutions(max_size=(768, 512), divisible=64, min_dim=256)
    assert (512, 512) in res
    for w, h in res:
        assert w % 64 == 0 and h % 64 == 0
        assert (w / 8) * (h / 8) <= (768 / 8) * (512 / 8) or (w, h) == (512, 512)
        assert w >= 256 and h >= 256


def test_bucket_assignment_nearest_aspect():
    sizes = {0: (512, 512), 1: (800, 600), 2: (600, 800), 3: (1600, 900)}
    plan = BucketPlan.build(sizes, batch_size=1)
    for img_id, (w, h) in sizes.items():
        bw, bh = plan.resolution_of(img_id)
        # assigned bucket aspect should be the argmin over the grid
        aspects = plan.aspects
        expected = int(np.abs(aspects - w / h).argmin())
        assert plan.assignments[img_id] == expected, (img_id, (bw, bh))


def test_bucket_batches_uniform_resolution_and_full_coverage():
    rng = np.random.RandomState(0)
    sizes = {i: (int(rng.choice([512, 640, 768])), int(rng.choice([512, 640, 768]))) for i in range(37)}
    plan = BucketPlan.build(sizes, batch_size=4)
    seen = []
    for ids, res in plan.generator():
        assert len(ids) == 4
        seen.extend(ids)
        for i in ids:
            if res != plan.base_res:
                assert plan.resolution_of(i) == tuple(res)
    # epoch delivers batch_total * bsz distinct images
    assert len(seen) == len(set(seen)) == plan.batches_per_epoch() * 4


def test_bucket_rank_sharding_partitions_items():
    """Multi-rank delivery: over one epoch, ranks get disjoint id sets (the
    reference's only distributed-aware logic, aspect_ratio_bucketing.py:133-135)."""
    rng = np.random.RandomState(1)
    sizes = {i: (int(rng.choice([512, 768])), 512) for i in range(64)}
    per_rank = []
    for rank in range(4):
        plan = BucketPlan.build(sizes, batch_size=2, world_size=4, global_rank=rank, seed=7)
        got = []
        for ids, _ in plan.generator():
            got.extend(ids)
        per_rank.append(set(got))
    for a in range(4):
        for b in range(a + 1, 4):
            assert per_rank[a].isdisjoint(per_rank[b])
    total = set().union(*per_rank)
    assert len(total) == 64 - (64 % (2 * 4))


@pytest.fixture()
def tiny_dataset_dir(tmp_path):
    rng = np.random.RandomState(0)
    rows = []
    for i in range(6):
        img = Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8))
        mask = Image.fromarray((np.ones((32, 32)) * 255).astype(np.uint8))
        img.save(tmp_path / f"{i}.src.jpg")
        mask.save(tmp_path / f"{i}.mask.jpg")
        rows.append(f"{i}.src.jpg,{i}.mask.jpg,\"A TOK photo number {i}\"")
    (tmp_path / "captions.csv").write_text(
        "image_path,mask_path,caption\n" + "\n".join(rows)
    )
    return str(tmp_path)


def test_latent_dataset_caches_distributions(tiny_dataset_dir):
    vae = init_vae_params(jax.random.PRNGKey(0), TINY_VAE_CONFIG, dtype=jnp.float32)
    ds = LatentDataset.from_directory(
        tiny_dataset_dir, vae, TINY_VAE_CONFIG, size=(32, 32),
        substitute_caption_map={"TOK": "<s0><s1>"},
    )
    assert len(ds) == 6
    # VAE with 2 blocks downsamples by 2 (latent factor for the tiny config)
    assert ds.latent_mean.shape == (6, 16, 16, 4)
    assert ds.masks.shape == (6, 16, 16, 1)
    assert all("<s0><s1>" in c for c in ds.captions)
    assert all(c == c.lower() for c in ds.captions)
    batch = ds.batch([0, 3])
    assert batch["latent_mean"].shape == (2, 16, 16, 4)
    assert len(batch["captions"]) == 2


def test_epoch_sampler_full_coverage_per_epoch():
    """Reference DataLoader(shuffle=True) semantics (ref main.py:200,258):
    every index appears exactly once per epoch."""
    s = EpochSampler(10, seed=3)
    drawn = []
    for _ in range(5):  # 5 batches of 4 = 2 epochs
        drawn.extend(s.next_batch(4))
    assert sorted(drawn[:10]) == list(range(10))
    assert sorted(drawn[10:20]) == list(range(10))
    # epochs are differently shuffled (overwhelmingly likely for n=10)
    assert drawn[:10] != drawn[10:20]
    assert s.epoch == 2


def test_epoch_sampler_batch_larger_than_dataset():
    """Tiny datasets (n < batch): the batch cycles whole permutations, still
    balanced — each epoch's worth inside the batch covers every index."""
    s = EpochSampler(3, seed=0)
    b = s.next_batch(8)
    assert len(b) == 8
    assert sorted(b[:3]) == [0, 1, 2] and sorted(b[3:6]) == [0, 1, 2]


def test_epoch_sampler_resume_replay_matches():
    """Resume fast-forward replays draws: a fresh sampler advanced k batches
    continues with exactly the same sequence as the uninterrupted one."""
    a = EpochSampler(7, seed=11)
    seq = [a.next_batch(2) for _ in range(9)]
    b = EpochSampler(7, seed=11)
    for _ in range(4):
        b.next_batch(2)
    assert [b.next_batch(2) for _ in range(5)] == seq[4:]


def test_latent_dataset_spills_to_disk(tiny_dataset_dir):
    """Past max_in_ram the latent cache lives in disk memmaps (the reference
    spills per-item .pt files past 500 images, trainer/dataset.py:66-90) and
    batches are identical to the RAM path."""
    vae = init_vae_params(jax.random.PRNGKey(0), TINY_VAE_CONFIG, dtype=jnp.float32)
    kwargs = dict(size=(32, 32), substitute_caption_map={"TOK": "<s0><s1>"})
    ram = LatentDataset.from_directory(tiny_dataset_dir, vae, TINY_VAE_CONFIG, **kwargs)
    disk = LatentDataset.from_directory(
        tiny_dataset_dir, vae, TINY_VAE_CONFIG, max_in_ram=3, **kwargs
    )
    cache_dir = os.path.join(tiny_dataset_dir, "latent_cache")
    assert os.path.isdir(cache_dir) and len(os.listdir(cache_dir)) == 3
    assert isinstance(disk.latent_mean, np.memmap)
    for k in ("latent_mean", "latent_logvar", "mask"):
        np.testing.assert_array_equal(ram.batch([0, 4])[k], disk.batch([0, 4])[k])


def test_latent_dataset_bucketed_spill(tiny_dataset_dir):
    """Bucketed caches spill too; BucketStore rows match the RAM path."""
    vae = init_vae_params(jax.random.PRNGKey(0), TINY_VAE_CONFIG, dtype=jnp.float32)
    kwargs = dict(
        size=(32, 32), aspect_ratio_bucketing=True, train_batch_size=2, seed=5
    )
    ram = LatentDataset.from_directory(tiny_dataset_dir, vae, TINY_VAE_CONFIG, **kwargs)
    disk = LatentDataset.from_directory(
        tiny_dataset_dir, vae, TINY_VAE_CONFIG, max_in_ram=3, **kwargs
    )
    assert os.path.isdir(os.path.join(tiny_dataset_dir, "latent_cache"))
    for res, store in ram.bucket_latents.items():
        dstore = disk.bucket_latents[res]
        assert isinstance(dstore, BucketStore)
        assert set(store.keys()) == set(dstore.keys())
        for i in store.keys():
            for a, b in zip(store[i], dstore[i]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    data, res = disk.bucketed_batch()
    assert data["latent_mean"].shape[0] == 2


def test_round_and_dimension_math():
    assert round_to_nearest_multiple(500, 64) == 512
    assert round_to_nearest_multiple(543, 64) == 512
    assert round_to_nearest_multiple(545, 64) == 576
    # square
    assert calculate_new_dimensions(512, 1.0) == [512, 512]
    # 3:2 landscape at 768 budget
    w, h = calculate_new_dimensions(768, 1.5)
    assert w > h and w % 64 == 0 and h % 64 == 0


def test_center_of_mass():
    arr = np.zeros((100, 100), np.uint8)
    arr[10:30, 60:80] = 255  # blob centered at (70, 20) in (x, y)
    cx, cy = center_of_mass(Image.fromarray(arr))
    assert abs(cx - 69.5) < 2 and abs(cy - 19.5) < 2


def test_crop_to_aspect_ratio_shapes():
    img = Image.new("RGB", (640, 480))
    out = crop_to_aspect_ratio(img, (320, 240), target_aspect_ratio=1.0, resize_to=256)
    assert out.size == (256, 256)
    out = crop_to_aspect_ratio(img, (0, 0), target_aspect_ratio=1.0, resize_to=256)
    assert out.size == (256, 256)  # clamped at borders
    wide = crop_to_aspect_ratio(img, (320, 240), target_aspect_ratio=2.0, resize_to=512)
    assert wide.size == (512, 256)


def test_grow_mask_blur_expands_and_keeps_min():
    arr = np.full((64, 64), 10, np.uint8)  # background floor
    arr[28:36, 28:36] = 255
    mask = Image.fromarray(arr)
    grown = grow_mask(mask, dilation_radius=0, blur_radius=3)
    g = np.asarray(grown)
    assert g.min() >= 10  # background floor preserved
    assert g[26, 32] > 10  # blur spread beyond the original blob
