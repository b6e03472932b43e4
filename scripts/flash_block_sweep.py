"""Sweep Pallas flash-attention block sizes for a given SD shape on the TPU.

Times fwd+grad of flash_mha at each (block_q, block_k) via an in-jit scan
(so per-call tunnel dispatch doesn't pollute the numbers). Used to pick the
shipped defaults in ops/flash_attention.py (round 2 picked 512/1024 on the
SDXL d=64 shapes; this generalizes the sweep to any shape, e.g. SD15's
L=4096 d=40 — scripts invoked with SWEEP_* env knobs).

  SWEEP_B=8 SWEEP_L=4096 SWEEP_H=8 SWEEP_D=40 python scripts/flash_block_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    B = int(os.environ.get("SWEEP_B", "8"))
    L = int(os.environ.get("SWEEP_L", "4096"))
    H = int(os.environ.get("SWEEP_H", "8"))
    D = int(os.environ.get("SWEEP_D", "40"))
    reps = int(os.environ.get("SWEEP_REPS", "20"))

    from sd_lora_trainer_tpu.ops.flash_attention import _named_flash

    key = jax.random.PRNGKey(0)
    sm_scale = 1.0 / (D**0.5)
    q = jax.random.normal(key, (B, H, L, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, L, D), jnp.bfloat16)

    results = []
    for blk_q in (256, 512, 1024):
        for blk_k in (512, 1024, 2048):
            if blk_q > L or blk_k > L:
                continue
            f = _named_flash(sm_scale, blk_q, blk_k, "")

            def loss(qq):
                return jnp.sum(f(qq, k, v).astype(jnp.float32) ** 2)

            @jax.jit
            def bench(qq):
                def body(c, _):
                    g = jax.grad(loss)(c)
                    return c + 1e-6 * g.astype(c.dtype), None

                out, _ = jax.lax.scan(body, qq, None, length=reps)
                return out

            try:
                r = bench(q)
                jax.block_until_ready(r)
                t0 = time.time()
                r = bench(q)
                s = float(jnp.sum(r.astype(jnp.float32)))  # hard sync
                dt = (time.time() - t0) / reps * 1000
                results.append((blk_q, blk_k, dt))
                print(f"block_q={blk_q:5d} block_k={blk_k:5d}: {dt:8.2f} ms/fwd+grad  (chk {s:.1f})",
                      flush=True)
            except Exception as e:
                print(f"block_q={blk_q:5d} block_k={blk_k:5d}: FAILED {str(e)[:120]}", flush=True)

    if results:
        best = min(results, key=lambda x: x[2])
        print(f"BEST: block_q={best[0]} block_k={best[1]} ({best[2]:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
