"""OVO-TPU: TPU-native open-vocabulary online 3D semantic mapping.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of tberriel/OVO
(RA-L 2025, arXiv 2411.15043): an online system that streams posed RGB-D
keyframes, segments them with a SAM2-class model, tracks 2D segments into
persistent 3D object instances, fuses per-instance CLIP-family embeddings
across views, and answers free-text queries / zero-shot classification over
the resulting 3D instance map.

Unlike the reference (single-GPU PyTorch, growing tensors, Python
dict-of-objects bookkeeping), everything per-keyframe and everything over the
map runs as a small number of jitted XLA programs over fixed-capacity padded
device buffers, with Pallas kernels for the hot ops and `shard_map` scale-out
over a TPU mesh. The SLAM geometry front-end stays host-side (C++ where the
reference uses native code).

Layout (mirrors SURVEY.md section 2's component inventory):
  config     -- YAML config tree w/ inherit_from + recursive merge
  geometry   -- projective association math (jit)
  ops        -- device ops: segment votes, mask NMS, masked pooling, attention
  mapping    -- map/instance state pytrees, association program, pipeline
  models     -- JAX ViT/CLIP/PE/SAM2-class towers + weight converters
  slam       -- geometry backbones (vanilla GT-pose mapper, C++ tracker binding)
  parallel   -- mesh / sharding helpers
  eval       -- confusion-matrix metrics, GT label transfer
  data       -- datasets (Replica/ScanNet/ScanNetPP/Matterport), mask fixtures
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even when a site plugin force-registers an accelerator
# backend (this sandbox's sitecustomize registers the axon TPU plugin in a
# way that ignores the env var; the config API wins). Without this, a
# "JAX_PLATFORMS=cpu" run silently grabs the TPU -- and concurrent clients
# crash the shared TPU worker.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # already initialized with devices in use
        pass
