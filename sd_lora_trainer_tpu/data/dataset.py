"""Latent-cached training dataset.

TPU counterpart of PreprocessedDataset (reference: trainer/dataset.py:30-195):
reads the preprocessed directory ({i}.src.jpg, {i}.mask.jpg, captions.csv),
lowercases captions and substitutes TOK -> "<s0><s1>...", and encodes every
image through the VAE ONCE, caching the latent *distribution* (mean, logvar)
so a fresh latent is sampled every step (the reference re-samples per epoch at
dataset access, dataset.py:186 — the same regularization).

TPU-first differences:
- encoding runs batched through a jitted NHWC VAE on device, not image-by-
  image on the host loop;
- the cache is a pair of [N, h, w, 4] numpy arrays (+ [N, h, w, 1] masks),
  trivially shardable across hosts;
- with bucketing, each image is encoded at its bucket resolution (per-bucket
  cache), so bucketed batches have uniform shapes — the upstream bucketing
  path is broken (dataset.py:115-136); ours is exercised by tests.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sd_lora_trainer_tpu.data.bucketing import BucketPlan
from sd_lora_trainer_tpu.models.vae import VAEConfig, vae_encode


def load_image_for_vae(path: str, w: int, h: int) -> np.ndarray:
    """Bicubic resize + [-1, 1] normalization, HWC float32 (the reference's
    prepare_image: dataset.py:11-16 via pipe.image_processor)."""
    img = Image.open(path).convert("RGB").resize((w, h), resample=Image.BICUBIC, reducing_gap=1)
    arr = np.asarray(img, np.float32) / 255.0
    return arr * 2.0 - 1.0


def load_mask(path: str, w: int, h: int) -> np.ndarray:
    """Grayscale [0,1] float mask resized to latent resolution later
    (reference prepare_mask: dataset.py:19-27)."""
    img = Image.open(path).convert("L").resize((w, h), resample=Image.BICUBIC, reducing_gap=1)
    return np.asarray(img, np.float32) / 255.0


def _downsample_mask_nearest(mask: np.ndarray, lh: int, lw: int) -> np.ndarray:
    """Nearest-neighbor downsample to the latent grid (dataset.py:168-175)."""
    h, w = mask.shape
    ys = (np.arange(lh) * (h / lh)).astype(np.int32)
    xs = (np.arange(lw) * (w / lw)).astype(np.int32)
    return mask[ys][:, xs]


class EpochSampler:
    """Shuffled epoch-coverage sampler.

    Matches the reference DataLoader(shuffle=True) semantics (reference
    main.py:200, :258): every index appears exactly once per epoch. Batches
    draw sequentially from a per-epoch permutation; a batch that straddles an
    epoch boundary borrows the head of the NEXT epoch's permutation so the
    jitted step always sees a static batch shape (the torch DataLoader instead
    emits a ragged final batch, which would force an XLA recompile).

    Deterministic given (n, seed): resume fast-forward replays the same draw
    sequence and lands at the same position in the same permutation.
    """

    def __init__(self, n: int, seed: int):
        self.n = int(n)
        self._rng = np.random.RandomState(seed)
        self.perm = self._rng.permutation(self.n)
        self.pos = 0
        self.epoch = 0

    def next_batch(self, batch_size: int) -> List[int]:
        out: List[int] = []
        while len(out) < batch_size:
            take = min(batch_size - len(out), self.n - self.pos)
            out.extend(int(i) for i in self.perm[self.pos : self.pos + take])
            self.pos += take
            if self.pos == self.n:
                self.perm = self._rng.permutation(self.n)
                self.pos = 0
                self.epoch += 1
        return out


class BucketStore:
    """img_id -> (mean, logvar, mask) row mapping over stacked arrays.

    The arrays may be RAM ndarrays or disk-backed memmaps (large datasets
    spill — the reference's >500-image .pt spill, trainer/dataset.py:66-90);
    either way rows are materialized only when indexed."""

    def __init__(self, ids: List[int], mean, logvar, mask):
        self._rows = {int(img_id): j for j, img_id in enumerate(ids)}
        self.mean, self.logvar, self.mask = mean, logvar, mask

    def keys(self):
        return self._rows.keys()

    def __contains__(self, i):
        return int(i) in self._rows

    def __len__(self):
        return len(self._rows)

    def __getitem__(self, i):
        j = self._rows[int(i)]
        return self.mean[j], self.logvar[j], self.mask[j]


@dataclasses.dataclass
class LatentDataset:
    captions: List[str]
    # square path: single-resolution caches
    latent_mean: Optional[np.ndarray] = None  # [N, h, w, 4]
    latent_logvar: Optional[np.ndarray] = None
    masks: Optional[np.ndarray] = None  # [N, h, w, 1]
    vae_scaling_factor: float = 0.18215
    train_img_size: Tuple[int, int] = (512, 512)
    # bucketed path: per-resolution caches keyed by (w, h)
    bucket_plan: Optional[BucketPlan] = None
    bucket_latents: Optional[Dict[Tuple[int, int], "BucketStore"]] = None

    def __len__(self):
        return len(self.captions)

    # -- construction --------------------------------------------------------

    @classmethod
    def from_directory(
        cls,
        data_dir: str,
        vae_params,
        vae_config: VAEConfig,
        size: Tuple[int, int],
        substitute_caption_map: Optional[Dict[str, str]] = None,
        aspect_ratio_bucketing: bool = False,
        train_batch_size: int = 4,
        encode_batch: int = 8,
        seed: int = 42,
        world_size: int = 1,
        global_rank: int = 0,
        max_in_ram: int = 500,
    ) -> "LatentDataset":
        import pandas as pd

        csv_path = os.path.join(data_dir, "captions.csv")
        data = pd.read_csv(csv_path, dtype={"caption": str})
        captions = data["caption"].str.lower()
        for key, value in (substitute_caption_map or {}).items():
            captions = captions.str.replace(key.lower(), value, regex=False)
        captions = captions.fillna("").tolist()
        image_paths = [os.path.join(data_dir, p) for p in data["image_path"]]
        mask_paths = (
            [os.path.join(data_dir, p) for p in data["mask_path"]]
            if "mask_path" in data.columns
            else None
        )

        encode = jax.jit(lambda imgs: vae_encode(vae_params, imgs, vae_config))
        # latent downsample factor: one 2x per non-final encoder block (8 for SD)
        factor = 2 ** (len(vae_config.block_out_channels) - 1)

        # Large datasets spill the latent cache to disk-backed memmaps instead
        # of host RAM (the reference writes per-item .pt files past 500 images,
        # trainer/dataset.py:66-90; one memmap per cache is the same idea with
        # O(1) open files and OS page-cache backed random access). Arrays are
        # filled chunk-by-chunk during encoding, so peak host memory stays at
        # one encode batch regardless of dataset size.
        spill_dir = None
        if len(image_paths) > max_in_ram:
            spill_dir = os.path.join(data_dir, "latent_cache")
            os.makedirs(spill_dir, exist_ok=True)
            print(
                f"[latent-cache] {len(image_paths)} images > {max_in_ram}: "
                f"spilling latents to {spill_dir}"
            )

        def _alloc(shape, name):
            if spill_dir is None:
                return np.empty(shape, np.float32)
            return np.lib.format.open_memmap(
                os.path.join(spill_dir, name), mode="w+", shape=shape, dtype=np.float32
            )

        def encode_at(paths, mpaths, w, h, tag="sq"):
            lh, lw = h // factor, w // factor
            n = len(paths)
            mean_a = logvar_a = None
            for start in range(0, n, encode_batch):
                chunk = paths[start : start + encode_batch]
                imgs = np.stack([load_image_for_vae(p, w, h) for p in chunk])
                mean, logvar = encode(jnp.asarray(imgs))
                if mean_a is None:
                    mean_a = _alloc((n,) + mean.shape[1:], f"{tag}_{w}x{h}_mean.npy")
                    logvar_a = _alloc((n,) + logvar.shape[1:], f"{tag}_{w}x{h}_logvar.npy")
                mean_a[start : start + len(chunk)] = np.asarray(mean, np.float32)
                logvar_a[start : start + len(chunk)] = np.asarray(logvar, np.float32)
            mask_a = _alloc((n, lh, lw, 1), f"{tag}_{w}x{h}_mask.npy")
            for i in range(n):
                if mpaths is None:
                    mask_a[i] = 1.0
                else:
                    m = load_mask(mpaths[i], w, h)
                    mask_a[i] = _downsample_mask_nearest(m, lh, lw)[..., None]
            return mean_a, logvar_a, mask_a

        if not aspect_ratio_bucketing:
            w, h = size
            mean, logvar, masks = encode_at(image_paths, mask_paths, w, h)
            return cls(
                captions=captions,
                latent_mean=mean,
                latent_logvar=logvar,
                masks=masks,
                vae_scaling_factor=vae_config.scaling_factor,
                train_img_size=(w, h),
            )

        # bucketed: group images by their assigned bucket resolution and
        # encode each group at that resolution
        image_sizes = {}
        for i, p in enumerate(image_paths):
            with Image.open(p) as im:
                image_sizes[i] = im.size
        plan = BucketPlan.build(
            image_sizes,
            batch_size=train_batch_size,
            base_res=tuple(size),
            max_size=(int(size[0] * 1.5), size[1]),
            seed=seed,
            world_size=world_size,
            global_rank=global_rank,
        )
        bucket_latents: Dict[Tuple[int, int], BucketStore] = {}
        resolutions = set(plan.used_resolutions())
        resolutions.add(tuple(size))  # leftover batches use base resolution
        for res in resolutions:
            w, h = res
            members = [i for i in range(len(image_paths)) if i in plan.assignments]
            ids = [i for i in members if plan.resolution_of(i) == res] if res != tuple(size) else members
            # base resolution must cover every image (leftover fallback)
            if res == tuple(size):
                ids = list(range(len(image_paths)))
            if not ids:
                continue
            mean, logvar, masks = encode_at(
                [image_paths[i] for i in ids],
                [mask_paths[i] for i in ids] if mask_paths else None,
                w,
                h,
                tag="bucket",
            )
            bucket_latents[res] = BucketStore(ids, mean, logvar, masks)
        return cls(
            captions=captions,
            vae_scaling_factor=vae_config.scaling_factor,
            train_img_size=tuple(size),
            bucket_plan=plan,
            bucket_latents=bucket_latents,
        )

    # -- batching ------------------------------------------------------------

    def batch(self, indices: List[int]) -> Dict[str, np.ndarray]:
        """Square-resolution batch of latent dists + masks + captions."""
        idx = np.asarray(indices)
        return {
            "latent_mean": self.latent_mean[idx],
            "latent_logvar": self.latent_logvar[idx],
            "mask": self.masks[idx],
            "captions": [self.captions[i] for i in indices],
        }

    def bucketed_batch(self) -> Tuple[Dict[str, np.ndarray], Tuple[int, int]]:
        assert self.bucket_plan is not None
        ids, res = self.bucket_plan.get_batch()
        res = tuple(res)
        store = self.bucket_latents[res]
        mean = np.stack([store[i][0] for i in ids])
        logvar = np.stack([store[i][1] for i in ids])
        mask = np.stack([store[i][2] for i in ids])
        return (
            {
                "latent_mean": mean,
                "latent_logvar": logvar,
                "mask": mask,
                "captions": [self.captions[i] for i in ids],
            },
            res,
        )
