"""Device-mesh construction and sharding rules.

The reference has no distributed layer at all (SURVEY.md section 2.7); the
TPU-native scale-out is:
  dp  -- keyframes (and scenes) sharded on the batch axis; encoders
         replicated (SAM + CLIP inference is embarrassingly parallel over
         frames)
  tp  -- tensor parallelism inside the ViT towers: attention heads and MLP
         hidden dims sharded, XLA/GSPMD inserting the all-reduces over ICI
  point-axis -- the map's point buffers shard across devices for the
         association step (the closest analogue of sequence parallelism in
         this workload, SURVEY.md section 5.7), with psum'd vote matrices.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("dp", "tp"),
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        # favor dp; tp only when the device count has a factor to spare
        tp = 2 if n % 2 == 0 and n >= 4 else 1
        shape = (n // tp, tp)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_vit_params(params, mesh: Mesh, tp_axis: str = "tp"):
    """Tensor-parallel placement for a ViT/text param tree: qkv + mlp.fc
    shard their OUTPUT features, out + mlp.proj shard their INPUT features
    (Megatron layout -> one psum per block, inserted by GSPMD)."""

    def place(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        spec = P()
        joined = "/".join(str(n) for n in names)
        if leaf is None or not hasattr(leaf, "ndim"):
            return leaf
        if leaf.ndim == 2:
            if ("qkv" in joined or "mlp/fc" in joined) and "w" in names[-1]:
                spec = P(None, tp_axis)
            elif (("attn/out" in joined or "mlp/proj" in joined)
                  and "w" in names[-1]):
                spec = P(tp_axis, None)
        elif leaf.ndim == 1 and ("qkv" in joined or "mlp/fc" in joined):
            spec = P(tp_axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
