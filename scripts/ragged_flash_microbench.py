"""Isolate the ragged-bucket flash cost: time fwd+grad of flash_mha at the
832x1216 bucket's attention lengths vs their square-bucket counterparts.

The r4/r5 bucketed bench showed the 832x1216 train-step program ~21x slower
than 1024x1024 at the same pixel count. flash_mha pads ragged self-attention
lengths (3952 -> 4096, 988 -> 1024) and masks the pad via segment ids inside
the Pallas kernel (ops/flash_attention.py:_pad_plan/_named_flash). If the
kernel itself is fast at the padded+masked shapes, the slowdown lives in the
convolution/layout side of the step, not here.

Each case times an in-jit lax.scan of fwd+grad calls (tunnel dispatch does
not pollute the numbers). Cases:
  - L=4096 plain        (square 1024px top self-attn, the known-good shape)
  - L=3952 padded+masked (ragged 832x1216 52x76 tokens -> pads to 4096)
  - L=1024 plain        (square second level)
  - L=988 padded+masked  (ragged 26x38 tokens -> pads to 1024)

Usage: python scripts/ragged_flash_microbench.py
Env: MB_B (batch, default 8), MB_REPS (scan length, default 20).
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


def time_case(label, B, L, heads, head_dim, reps):
    from sd_lora_trainer_tpu.ops.flash_attention import flash_mha

    key = jax.random.PRNGKey(0)
    d = heads * head_dim
    q = jax.random.normal(key, (B, L, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, L, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, L, d), jnp.bfloat16)

    def loss(qq):
        return jnp.sum(flash_mha(qq, k, v, heads).astype(jnp.float32) ** 2)

    @jax.jit
    def bench(qq):
        def body(c, _):
            g = jax.grad(loss)(c)
            return c + 1e-6 * g.astype(c.dtype), None

        out, _ = jax.lax.scan(body, qq, None, length=reps)
        return out

    t0 = time.time()
    r = bench(q)
    jax.block_until_ready(r)
    print(f"{label}: compile+first {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    r = bench(q)
    s = float(jnp.sum(r.astype(jnp.float32)))  # hard sync (axon)
    dt = (time.time() - t0) / reps * 1000
    print(f"{label}: {dt:8.2f} ms/fwd+grad  (chk {s:.1f})", flush=True)
    return dt


def main():
    B = int(os.environ.get("MB_B", "8"))
    reps = int(os.environ.get("MB_REPS", "20"))
    # SDXL c640 level: 10 heads x 64; c1280 level: 20 heads x 64
    cases = [
        ("square  L=4096 h=10 d=64 (plain)       ", B, 4096, 10, 64),
        ("ragged  L=3952 h=10 d=64 (pad 4096+seg)", B, 3952, 10, 64),
        ("square  L=1024 h=20 d=64 (plain)       ", B, 1024, 20, 64),
        ("ragged  L= 988 h=20 d=64 (pad 1024+seg)", B, 988, 20, 64),
    ]
    results = {}
    for label, b, l, h, dh in cases:
        results[label] = time_case(label, b, l, h, dh, reps)
    r = list(results.values())
    if r[0] and r[1]:
        print(f"ragged/square ratio @4096: {r[1] / r[0]:.2f}x", flush=True)
    if r[2] and r[3]:
        print(f"ragged/square ratio @1024: {r[3] / r[2]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
