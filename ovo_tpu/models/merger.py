"""Learned 3-descriptor merger (WeightsPredictorMerger).

Reference: /root/reference/ovo/entities/clips_merging.py:26-56 -- a
TransformerEncoder over the 3 candidate CLIP vectors (global / masked-crop /
bbox-crop) + an MLP head -> softmax weights -> weighted sum, L2-normalized.

Includes a training step (optax) -- the merger is the one trainable
component of the system and anchors the multi-chip training dry-run.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import layers as L

Array = jax.Array
Params = Dict[str, Any]


def init_merger(key, d_model: int = 1152, depth: int = 5, n_heads: int = 8,
                mlp_hidden: int = 512) -> Params:
    ks = jax.random.split(key, depth + 2)
    return {
        "blocks": [L.init_block(ks[i], d_model, n_heads, mlp_ratio=4.0)
                   for i in range(depth)],
        "head": {
            "fc": L.init_linear(ks[-2], d_model, mlp_hidden),
            "proj": L.init_linear(ks[-1], mlp_hidden, 1),
        },
    }


def merger_apply(params: Params, clips: Array, n_heads: int = 8) -> Array:
    """clips (B, 3, D) -> fused (B, D): transformer over the 3 tokens,
    per-token scalar -> softmax weights -> weighted sum -> normalize."""
    x = clips
    for blk in params["blocks"]:
        x = L.transformer_block(blk, x, n_heads)
    logits = L.linear(params["head"]["proj"],
                      jax.nn.relu(L.linear(params["head"]["fc"], x)))[..., 0]
    w = jax.nn.softmax(logits, axis=-1)                   # (B, 3)
    fused = jnp.einsum("bk,bkd->bd", w, clips,
                       preferred_element_type=jnp.float32)
    return fused / jnp.maximum(jnp.linalg.norm(fused, axis=-1, keepdims=True),
                               1e-12)


def merger_loss(params: Params, clips: Array, target: Array) -> Array:
    """Cosine-distance regression against target descriptors (how the
    reference's merger was trained offline)."""
    fused = merger_apply(params, clips)
    tgt = target / jnp.maximum(jnp.linalg.norm(target, axis=-1, keepdims=True),
                               1e-12)
    return jnp.mean(1.0 - jnp.sum(fused * tgt, axis=-1))


def make_train_step(optimizer):
    import optax  # noqa: F401

    @jax.jit
    def train_step(params, opt_state, clips, target):
        loss, grads = jax.value_and_grad(merger_loss)(params, clips, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step


class LearnedMerger:
    def __init__(self, params: Params, n_heads: int = 8):
        self.params = params
        self.n_heads = n_heads

    def __call__(self, clips: Array) -> Array:
        return merger_apply(self.params, clips, self.n_heads)


def load_merger(path: Optional[str]) -> LearnedMerger:
    """Load the reference's trained merger weights if present; random init
    otherwise (structure-compatible)."""
    import os

    if path and os.path.exists(os.path.join(path, "model.pt")):
        from .convert import convert_merger_state_dict
        import torch

        sd = torch.load(os.path.join(path, "model.pt"), map_location="cpu",
                        weights_only=False)
        return LearnedMerger(convert_merger_state_dict(sd))
    return LearnedMerger(init_merger(jax.random.PRNGKey(0)))
