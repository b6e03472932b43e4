"""Generic utilities (reference: trainer/utils/utils.py, trainer/checkpoint.py:58-81)."""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

# dtype map (reference: trainer/utils/utils.py:20-24). On TPU, fp16 maps to
# bfloat16 — float16 has no hardware support and bf16 is the native MXU type.
dtype_map = {
    "fp16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "fp32": jnp.float32,
}


def sanitize_name(name: str, max_length: int = 255) -> str:
    """Replace special characters with underscores.

    Same contract as the reference's `remove_delimiter_characters`
    (trainer/checkpoint.py:58-81): artifact filenames embed this name, so the
    mapping must match for artifact-name parity.
    """
    cleaned = re.sub(r"[^\w.-]+", "_", name)
    cleaned = re.sub(r"_+", "_", cleaned)
    cleaned = cleaned.strip("_.")
    cleaned = cleaned.lstrip(".")
    cleaned = cleaned[:max_length]
    if not cleaned:
        raise ValueError("Malformed name")
    return cleaned


def replace_in_string(s: str, replacements: dict) -> str:
    """Iterative regex replacement until fixpoint (reference: utils.py:27-37)."""
    while True:
        replaced = False
        for target, replacement in replacements.items():
            new_s = re.sub(target, replacement, s, flags=re.IGNORECASE)
            if new_s != s:
                s = new_s
                replaced = True
        if not replaced:
            break
    return s


def fix_prompt(prompt: str) -> str:
    """Punctuation / whitespace cleanup — same rule order as the reference
    (utils.py:39-47): collapse spaces, squash double commas, then normalize
    spacing around commas and periods."""
    if not prompt:
        return prompt
    prompt = re.sub(r"\s+", " ", prompt)
    prompt = re.sub(r",,", ",", prompt)
    prompt = re.sub(r"\s?,\s?", ", ", prompt)
    prompt = re.sub(r"\s?\.\s?", ". ", prompt)
    return prompt.strip()


def seed_everything(seed: int) -> None:
    """Seed host-side RNGs. Device-side randomness is threaded jax.random keys."""
    import random

    random.seed(seed)
    np.random.seed(seed % (2**32))


def print_system_info() -> None:
    """System diagnostics dump (reference: utils.py:93-118), TPU edition."""
    import shutil

    import jax

    try:
        import psutil

        mem = psutil.virtual_memory()
        print(f"RAM: {mem.used / 1e9:.1f} / {mem.total / 1e9:.1f} GB used")
    except ImportError:
        pass
    total, used, free = shutil.disk_usage("/")
    print(f"Disk: {used / 1e9:.1f} / {total / 1e9:.1f} GB used")
    for d in jax.devices():
        print(f"Device: {d.device_kind} (id={d.id})")
        try:
            stats = d.memory_stats()
            if stats:
                print(
                    f"  HBM: {stats.get('bytes_in_use', 0) / 1e9:.2f} / "
                    f"{stats.get('bytes_limit', 0) / 1e9:.2f} GB in use"
                )
        except Exception:
            pass
