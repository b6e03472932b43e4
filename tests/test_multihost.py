"""Multi-host (multi-process) training (parallel/distributed.py).

Spawns a real 2-process JAX cluster (CPU Gloo collectives, 4 virtual devices
per process = the same 8-device global mesh the single-process tests use) and
runs the full CLI trainer in both topologies. The exported LoRA adapters must
match: the multi-process run assembles the identical global batch from
per-process row slices, so the jitted step sees the same arrays and the same
8-way 'data' partition — exact single-process equivalence.

(SURVEY §2.4's per-host data sharding commitment; the reference's only
distributed hook is BucketManager rank sharding,
trainer/utils/aspect_ratio_bucketing.py:133-135.)
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    from sd_lora_trainer_tpu.models.synthesize import (
        TINY_CLIP_G_CONFIG,
        TINY_CLIP_L_CONFIG,
        TINY_VAE_CONFIG,
        synthesize_checkpoint,
    )
    from sd_lora_trainer_tpu.models.unet import TINY_SDXL_UNET_CONFIG

    root = tmp_path_factory.mktemp("multihost")
    ckpt = str(root / "tiny_sdxl.safetensors")
    synthesize_checkpoint(
        ckpt, "sdxl", TINY_SDXL_UNET_CONFIG, TINY_VAE_CONFIG, TINY_CLIP_L_CONFIG,
        TINY_CLIP_G_CONFIG, seed=0,
    )
    data_dir = root / "dataset"
    data_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        Image.fromarray(rng.randint(0, 255, (96, 96, 3), np.uint8)).save(
            data_dir / f"img_{i}.jpg"
        )
        (data_dir / f"img_{i}.txt").write_text(f"test pattern {i}")
    return {"ckpt": ckpt, "data": str(data_dir), "root": root}


def _config(tiny_env, out_dir, **overrides):
    cfg = dict(
        name="mh",
        lora_training_urls=tiny_env["data"],
        concept_mode="style",
        caption_model="no_caption",
        sd_model_version="sdxl",
        ckpt_path=tiny_env["ckpt"],
        seed=0,
        resolution=64,
        validation_img_size=64,
        train_batch_size=8,  # GLOBAL batch; 8 devices in both topologies
        max_train_steps=3,
        checkpointing_steps=100,
        n_sample_imgs=1,
        lora_rank=4,
        skip_gpt_cleanup=True,
        augment_imgs_up_to_n=0,
        steps_per_call=1,
        # the r3 advisor's deadlock scenario: rank-0-only writes while the
        # state gather is a collective — a hang here fails the Popen timeout
        save_train_state=True,
        output_dir=str(out_dir),
    )
    cfg.update(overrides)
    return cfg


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(cfg_path, n_local_devices, extra_env):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local_devices}",
        **extra_env,
    )
    return subprocess.Popen(
        [sys.executable, "main.py", str(cfg_path)],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _find_lora(out_dir):
    for dirpath, _, files in os.walk(out_dir):
        for f in files:
            if f.endswith("_lora.safetensors"):
                return os.path.join(dirpath, f)
    raise FileNotFoundError(f"no lora safetensors under {out_dir}")


def _load_st(path):
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def test_two_process_step_matches_single_process(tiny_env):
    root = tiny_env["root"]

    # single-process anchor: one process, 8 virtual devices, dp over 8
    sp_cfg = root / "sp_config.json"
    sp_cfg.write_text(json.dumps(_config(tiny_env, root / "runs_sp")))
    p = _launch(sp_cfg, 8, {})
    # generous: single-core build hosts run this alongside other work
    out, _ = p.communicate(timeout=2400)
    assert p.returncode == 0, out[-3000:]
    assert "[sharding] dp over mesh" in out

    # 2-process cluster: 4 local devices each, same 8-device global mesh
    port = _free_port()
    mp_cfg = root / "mp_config.json"
    mp_cfg.write_text(json.dumps(_config(tiny_env, root / "runs_mp")))
    common = {"SDT_COORDINATOR": f"localhost:{port}", "SDT_NUM_PROCESSES": "2"}
    procs = [
        _launch(mp_cfg, 4, {**common, "SDT_PROCESS_ID": str(i)}) for i in range(2)
    ]
    outs = [p.communicate(timeout=2400)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    assert "[distributed] process 0/2" in outs[0] + outs[1]

    sp = _load_st(_find_lora(root / "runs_sp"))
    mp = _load_st(_find_lora(root / "runs_mp"))
    assert sp.keys() == mp.keys()
    for k in sp:
        np.testing.assert_allclose(sp[k], mp[k], rtol=0, atol=1e-6, err_msg=k)

    # the resumable train state must exist in BOTH topologies (rank 0 wrote
    # it after the all-rank gather; no barrier deadlocked)
    for runs in (root / "runs_sp", root / "runs_mp"):
        found = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(runs)
            for f in fs
            if f == "train_state"
        ]
        assert found, f"no train_state artifact under {runs}"
