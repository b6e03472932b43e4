"""On-TPU flash-attention kernel CI (closes the zero-coverage hole: every
CPU-suite test exercises the einsum path only, because
flash_attention_qualifies gates on the TPU backend).

Marked `tpu`: runs only where a TPU is reachable. The parity itself lives in
scripts/flash_parity_tpu.py (fwd + grads for all SD head-dims, bf16
tolerance); this wrapper subprocess-runs it OUTSIDE the suite's forced-CPU
environment so the Pallas kernel actually executes on the chip.
"""

import os
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.tpu, pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_reachable() -> bool:
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; d=jax.devices(); assert d[0].platform != 'cpu', d"],
        env=env, capture_output=True, timeout=300,
    )
    return probe.returncode == 0


def test_flash_kernel_parity_on_chip():
    if not _tpu_reachable():
        pytest.skip("no TPU reachable from this environment")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "flash_parity_tpu.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-2000:]
    assert "PASS: flash fwd+grad parity" in result.stdout
