"""Safetensors save/load helpers.

`safetensors.numpy.save_file` serializes the raw buffer without honoring
strides, silently corrupting non-contiguous arrays (e.g. the transposed
kernels our exporters produce) — every save in this package goes through
`save_safetensors`, which forces C-contiguity first.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def save_safetensors(
    tensors: Dict[str, np.ndarray], path: str, metadata: Optional[Dict[str, str]] = None
) -> None:
    from safetensors.numpy import save_file

    # NB: np.ascontiguousarray promotes 0-d scalars to 1-d; kohya alpha
    # tensors must stay 0-d, so preserve ndim explicitly.
    contiguous = {
        k: np.ascontiguousarray(v) if np.ndim(v) > 0 else np.asarray(v)
        for k, v in tensors.items()
    }
    save_file(contiguous, path, metadata=metadata)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)
