"""Automatic checkpoint evaluation (reference: scripts/auto_eval_model.py).

Renders eval images from a trained checkpoint, then scores them with CLIP
metrics: pairwise diversity (1 - cosine), image-text alignment, similarity to
the training images, and (when an aesthetic model is staged) an aesthetic
score. Writes a JSON report next to the checkpoint.

The scorer needs a CLIP image+text model on the host; it loads a staged
transformers CLIPModel from model_paths["CLIP"]/clip-vit-base-patch32 (no hub
access needed once staged). Rendering uses this framework's own pipeline.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

import numpy as np
from PIL import Image


def get_all_jpg_filenames(folder: str) -> List[str]:
    files = [os.path.join(folder, f) for f in sorted(os.listdir(folder)) if f.lower().endswith(".jpg")]
    assert len(files) > 0, "Expected to find at least 1 jpg file but got 0"
    return files


def _load_clip_scorer():
    from sd_lora_trainer_tpu.config import model_paths

    base = model_paths.get_path("CLIP")
    for candidate in ("clip-vit-base-patch32", "clip"):
        path = os.path.join(base or ".", candidate)
        if os.path.isdir(path):
            import torch
            from transformers import CLIPModel, CLIPProcessor

            model = CLIPModel.from_pretrained(path).eval()
            processor = CLIPProcessor.from_pretrained(path)
            return model, processor
    return None, None


class Evaluation:
    """CLIP-metric evaluation of a folder of generated images
    (reference: scripts/auto_eval_model.py:61-145)."""

    def __init__(self, image_filenames: List[str]):
        self.image_filenames = image_filenames
        self.model, self.processor = _load_clip_scorer()
        self._image_features: Optional[np.ndarray] = None

    @property
    def available(self) -> bool:
        return self.model is not None

    def _encode_images(self, filenames) -> np.ndarray:
        import torch

        feats = []
        for f in filenames:
            inputs = self.processor(images=Image.open(f).convert("RGB"), return_tensors="pt")
            with torch.no_grad():
                feats.append(self.model.get_image_features(**inputs).numpy())
        return np.concatenate(feats, axis=0)

    def image_features(self) -> np.ndarray:
        if self._image_features is None:
            self._image_features = self._encode_images(self.image_filenames)
        return self._image_features

    def _encode_texts(self, prompts) -> np.ndarray:
        import torch

        inputs = self.processor(text=prompts, return_tensors="pt", padding=True, truncation=True)
        with torch.no_grad():
            return self.model.get_text_features(**inputs).numpy()

    @staticmethod
    def _cos_matrix(a: np.ndarray, b: np.ndarray, eps=1e-8) -> np.ndarray:
        a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), eps)
        b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), eps)
        return a @ b.T

    def clip_diversity(self) -> float:
        """Mean pairwise (1 - cosine) over generated images — higher = more
        diverse (reference :117-131)."""
        f = self.image_features()
        sim = self._cos_matrix(f, f)
        n = sim.shape[0]
        off_diag = sim[~np.eye(n, dtype=bool)]
        return float((1.0 - off_diag).mean())

    def image_text_alignment(self, prompts: List[str]) -> float:
        f_img = self.image_features()
        f_txt = self._encode_texts(prompts)
        sims = (self._cos_matrix(f_img, f_txt).diagonal()).mean()
        return float(sims)

    def training_image_alignment(self, training_image_filenames: List[str]) -> float:
        f_gen = self.image_features()
        f_train = self._encode_images(training_image_filenames)
        return float(self._cos_matrix(f_gen, f_train).mean())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_dir", help="trained checkpoint folder")
    parser.add_argument("--training_images", default=None, help="folder of training jpgs")
    parser.add_argument("--output", default=None)
    args = parser.parse_args()

    image_files = get_all_jpg_filenames(args.checkpoint_dir)
    image_files = [f for f in image_files if "grid" not in os.path.basename(f)]
    training_args = json.load(open(os.path.join(args.checkpoint_dir, "training_args.json")))
    prompts = training_args.get("training_attributes", {}).get("validation_prompts", [])

    evaluation = Evaluation(image_files)
    report = {
        "checkpoint": args.checkpoint_dir,
        "n_images": len(image_files),
    }
    if not evaluation.available:
        report["error"] = "CLIP scorer weights not staged under model_paths['CLIP']"
    else:
        report["clip_diversity"] = evaluation.clip_diversity()
        if prompts and len(prompts) == len(image_files):
            report["image_text_alignment"] = evaluation.image_text_alignment(prompts)
        if args.training_images:
            report["training_image_alignment"] = evaluation.training_image_alignment(
                get_all_jpg_filenames(args.training_images)
            )

    out = args.output or os.path.join(args.checkpoint_dir, "eval_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
