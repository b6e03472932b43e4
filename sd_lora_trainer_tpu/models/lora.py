"""LoRA / DoRA adapters as pytree transformations.

The reference injects adapters with peft (trainer/optimizer.py:74-105 for the
UNet — target modules to_k/to_q/to_v/to_out.0/conv2 — and :162 for the text
encoders — k/q/v/out_proj). Here an adapter set is its own pytree mirroring
the targeted subpaths; `inject_lora` grafts it into a base param tree (the
`dense`/`conv2d` primitives apply any "lora" subdict they find) and only the
adapter tree is passed to `jax.grad`/the optimizer, so base weights are
structurally frozen.

Export follows the reference's kohya contract (trainer/checkpoint.py:84-102):
keys `lora_unet_<path with _>.{lora_down.weight,lora_up.weight,alpha}` plus
`lora_te1_`/`lora_te2_` for the text encoders, alpha == rank (the diffusers
kohya converter emits `len(lora_down)` as alpha), torch weight layouts.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

UNET_TARGETS = ("to_q", "to_k", "to_v", "to_out.0", "conv2")
TEXT_ENCODER_TARGETS = ("q_proj", "k_proj", "v_proj", "out_proj")


class LoraAlpha:
    """Static scalar pytree node (zero leaves).

    The LoRA alpha is a hyperparameter, not a parameter: as a plain float
    leaf it would (a) receive optimizer updates — AdamW weight decay would
    silently shrink it — and (b) flip weak->strong dtype after
    optax.apply_updates, retriggering a full train-step recompile. As static
    aux data it is hashable jit cache key material instead.
    """

    def __init__(self, value: float):
        self.value = float(value)

    def __repr__(self):
        return f"LoraAlpha({self.value})"

    def __eq__(self, other):
        return isinstance(other, LoraAlpha) and other.value == self.value

    def __hash__(self):
        return hash(("LoraAlpha", self.value))


jax.tree_util.register_pytree_node(
    LoraAlpha, lambda s: ((), s.value), lambda value, _: LoraAlpha(value)
)


def alpha_value(alpha) -> float:
    return alpha.value if isinstance(alpha, LoraAlpha) else float(alpha)


def _walk(tree, path=()):
    """Yield (path, leaf_module_dict) for every param dict with a kernel."""
    if isinstance(tree, dict):
        if "kernel" in tree:
            yield path, tree
            return
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, path + (i,))


def _matches(path: Tuple, targets) -> bool:
    name = str(path[-1])
    return name in targets


# B-LoRA style block presets (reference: trainer/optimizer.py:51-71):
# restrict adapters to specific attention blocks instead of the whole UNet.
BLORA_CONTENT_BLOCKS = ("up_blocks.0.attentions.0",)
BLORA_STYLE_BLOCKS = ("up_blocks.0.attentions.1",)


def create_lora_params(
    key: jax.Array,
    base_params: dict,
    rank: int,
    alpha_multiplier: float = 1.0,
    targets=UNET_TARGETS,
    use_dora: bool = False,
    dtype=jnp.float32,
    target_blocks=None,
) -> dict:
    """Build an adapter tree for every matching module.

    Gaussian init (peft init_lora_weights="gaussian": A ~ N(0, 1/r), B = 0),
    alpha = rank * alpha_multiplier (reference: trainer/optimizer.py:86-95).
    DoRA adds a "magnitude" vector initialized to the base kernel's column
    norms. `target_blocks` optionally restricts injection to modules whose
    dotted path starts with one of the given prefixes (B-LoRA-style targeting,
    reference: trainer/optimizer.py:51-71).
    """
    alpha = float(rank * alpha_multiplier)
    lora_tree: dict = {}
    leaves = [(p, m) for p, m in _walk(base_params) if _matches(p, targets)]
    if target_blocks:
        prefixes = tuple(target_blocks)
        leaves = [
            (p, m)
            for p, m in leaves
            if ".".join(str(x) for x in p).startswith(prefixes)
        ]
    keys = jax.random.split(key, max(len(leaves), 1))
    for (path, module), k in zip(leaves, keys):
        kernel = module["kernel"]
        if kernel.ndim == 2:
            n_in, n_out = kernel.shape
            a = jax.random.normal(k, (n_in, rank), dtype) * (1.0 / rank)
            b = jnp.zeros((rank, n_out), dtype)
        elif kernel.ndim == 4:
            kh, kw, n_in, n_out = kernel.shape
            a = jax.random.normal(k, (kh, kw, n_in, rank), dtype) * (1.0 / rank)
            b = jnp.zeros((1, 1, rank, n_out), dtype)
        else:
            raise ValueError(f"Unsupported kernel ndim at {path}")
        entry = {"a": a, "b": b, "alpha": LoraAlpha(alpha)}
        if use_dora:
            kf = kernel.astype(jnp.float32)
            if kernel.ndim == 4:
                kf = kf.reshape(-1, kf.shape[-1])
            entry["magnitude"] = jnp.linalg.norm(kf, axis=0).astype(dtype)
        _set_path(lora_tree, path, entry)
    return lora_tree


def _set_path(tree: dict, path: Tuple, value):
    node = tree
    for p in path[:-1]:
        p = str(p)
        node = node.setdefault(p, {})
    node[str(path[-1])] = value


def inject_lora(base_params: dict, lora_params: dict) -> dict:
    """Return a copy of base_params with "lora" subdicts grafted in.

    Pure tree restructuring — no array copies; under jit the adapter leaves
    stay distinct so gradients w.r.t. lora_params flow only through them.
    """

    def graft(base, lora):
        # an adapter leaf ({a, b, alpha, ...}) grafts onto its projection dict
        # — which may lack "kernel" under the fused qkv/kv layout
        # (models/fuse.py moves base kernels into one concatenated matmul)
        if isinstance(base, dict) and isinstance(lora, dict) and "a" in lora:
            merged = dict(base)
            merged["lora"] = lora
            return merged
        if isinstance(base, dict):
            return {k: graft(v, lora[k]) if (isinstance(lora, dict) and k in lora) else v for k, v in base.items()}
        if isinstance(base, (list, tuple)):
            out = []
            for i, v in enumerate(base):
                li = None
                if isinstance(lora, dict) and str(i) in lora:
                    li = lora[str(i)]
                out.append(graft(v, li) if li is not None else v)
            return out
        return base

    return graft(base_params, lora_params)


def merge_lora(base_params: dict, lora_params: dict, scale: float = 1.0) -> dict:
    """Fuse adapters into the base weights: W' = W + scale·(alpha/r)·BA.

    Used at inference to render at a given lora_scale without the adapter
    matmuls (reference sets adapter scales on the pipe,
    trainer/checkpoint.py:31-55)."""

    def fuse(base, lora):
        if isinstance(base, dict) and "kernel" in base and isinstance(lora, dict) and "a" in lora:
            kernel = base["kernel"]
            a, b = lora["a"].astype(jnp.float32), lora["b"].astype(jnp.float32)
            rank = a.shape[-1]
            s = scale * alpha_value(lora["alpha"]) / rank
            if kernel.ndim == 2:
                delta = a @ b * s
            else:
                kh, kw, n_in, r = a.shape
                n_out = b.shape[-1]
                # conv-lora composition: (1x1 B) after (khxkw A) == khxkw kernel
                delta = jnp.einsum("hwir,ro->hwio", a, b[0, 0]) * s
            merged = dict(base)
            if "magnitude" in lora:
                w = kernel.astype(jnp.float32) + delta
                flat = w.reshape(-1, w.shape[-1]) if w.ndim == 4 else w
                col = jnp.linalg.norm(flat, axis=0)
                w = w * (lora["magnitude"] / jnp.maximum(col, 1e-6))
                merged["kernel"] = w.astype(kernel.dtype)
            else:
                merged["kernel"] = (kernel.astype(jnp.float32) + delta).astype(kernel.dtype)
            return merged
        if isinstance(base, dict):
            return {
                k: fuse(v, lora[k]) if (isinstance(lora, dict) and k in lora) else v
                for k, v in base.items()
            }
        if isinstance(base, (list, tuple)):
            out = []
            for i, v in enumerate(base):
                li = lora.get(str(i)) if isinstance(lora, dict) else None
                out.append(fuse(v, li) if li is not None else v)
            return out
        return base

    return fuse(base_params, lora_params)


# ---------------------------------------------------------------------------
# kohya-format export / import
# ---------------------------------------------------------------------------


def _lora_leaves(lora_tree) -> List[Tuple[str, dict]]:
    """[(dotted.module.path, {a,b,alpha,...})] for a lora tree."""
    out = []

    def walk(node, path):
        if isinstance(node, dict) and "a" in node and "b" in node:
            out.append((".".join(path), node))
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [str(k)])

    walk(lora_tree, [])
    return out


def kohya_state_dict(
    unet_lora: Optional[dict] = None,
    te_loras: Optional[List[Optional[dict]]] = None,
) -> Dict[str, np.ndarray]:
    """Adapter pytrees -> kohya/WebUI state dict (numpy, torch layouts).

    Key layout matches the reference's convert chain output after the
    `base_model_model_` strip (trainer/checkpoint.py:84-102): ComfyUI /
    AUTO1111 / sd-scripts all consume this.
    """
    sd: Dict[str, np.ndarray] = {}

    def emit(prefix: str, tree: dict):
        for path, entry in _lora_leaves(tree):
            key_base = prefix + path.replace(".", "_")
            a = np.asarray(entry["a"], np.float32)
            b = np.asarray(entry["b"], np.float32)
            rank = a.shape[-1]
            if a.ndim == 2:
                down = np.ascontiguousarray(a.T)  # [r, in]
                up = np.ascontiguousarray(b.T)  # [out, r]
            else:  # conv: a HWIO(r) -> [r, in, kh, kw]; b [1,1,r,out] -> [out, r, 1, 1]
                down = np.ascontiguousarray(np.transpose(a, (3, 2, 0, 1)))
                up = np.ascontiguousarray(np.transpose(b, (3, 2, 0, 1)))
            sd[f"{key_base}.lora_down.weight"] = down
            sd[f"{key_base}.lora_up.weight"] = up
            # diffusers' kohya converter writes alpha := rank (len(lora_down))
            sd[f"{key_base}.alpha"] = np.asarray(float(rank), np.float32)

    if unet_lora:
        emit("lora_unet_", unet_lora)
    for i, te_lora in enumerate(te_loras or []):
        if te_lora:
            emit(f"lora_te{i + 1}_", te_lora)
    return sd


def load_kohya_state_dict(
    sd: Dict[str, np.ndarray],
    unet_params: dict,
    te_params: List[Optional[dict]],
    alpha_multiplier: float = 1.0,
) -> Tuple[dict, List[Optional[dict]]]:
    """kohya state dict -> (unet_lora_tree, [te_lora_trees]).

    Inverse of `kohya_state_dict`; used by load_checkpoint for from-disk
    validation (reference: trainer/checkpoint.py:223-296).
    """

    def module_paths(prefix: str, base: dict):
        """dotted-with-underscore name -> real tree path, via base tree walk."""
        mapping = {}
        for path, _ in _walk(base):
            # "to_out.0" flattens to "to_out_0", same as the export side
            flat = "_".join(str(p) for p in path).replace(".", "_")
            mapping[flat] = path
        return mapping

    unet_map = module_paths("lora_unet_", unet_params)
    te_maps = [module_paths(f"lora_te{i+1}_", te) if te else {} for i, te in enumerate(te_params)]

    unet_tree: dict = {}
    te_trees: List[Optional[dict]] = [None] * len(te_params)

    groups: Dict[str, dict] = {}
    for key, value in sd.items():
        base_key, _, leaf = key.partition(".")
        groups.setdefault(base_key, {})[leaf] = np.asarray(value)

    for base_key, entry in groups.items():
        if base_key.startswith("lora_unet_"):
            flat = base_key[len("lora_unet_"):]
            target_map, which = unet_map, ("unet", None)
        elif base_key.startswith("lora_te"):
            idx = int(base_key[len("lora_te")]) - 1
            flat = base_key[len("lora_teX_"):]
            target_map, which = te_maps[idx], ("te", idx)
        else:
            raise ValueError(f"Unknown kohya key family: {base_key}")
        if flat not in target_map:
            raise KeyError(f"kohya module {base_key} not found in model tree")
        path = target_map[flat]
        down = entry["lora_down.weight"]
        up = entry["lora_up.weight"]
        alpha_raw = entry.get("alpha", down.shape[0])
        alpha = float(np.asarray(alpha_raw).reshape(-1)[0])
        if down.ndim == 2:
            a = jnp.asarray(down.T)  # (in, r)
            b = jnp.asarray(up.T)  # (r, out)
        else:
            a = jnp.asarray(np.transpose(down, (2, 3, 1, 0)))
            b = jnp.asarray(np.transpose(up, (2, 3, 1, 0)))
        node = {"a": a, "b": b, "alpha": LoraAlpha(alpha)}
        if which[0] == "unet":
            _set_path(unet_tree, path, node)
        else:
            if te_trees[which[1]] is None:
                te_trees[which[1]] = {}
            _set_path(te_trees[which[1]], path, node)

    return unet_tree, te_trees
