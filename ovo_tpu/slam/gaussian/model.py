"""Fixed-capacity gaussian map state for the Gaussian-SLAM tier.

Reference behavior: gaussian_model.py:25-409 + sem_gaussian_model.py:10-179
(/root/reference/ovo/submodules/gaussian_slam/entities/, /root/reference/ovo/
slam/). The reference grows torch parameter tensors and rebuilds the Adam
state on every densify/prune; on TPU the map is a preallocated struct-of-
arrays pytree with a ``valid`` mask — add = prefix-sum scatter-append into
free slots, prune = clearing valid bits — so the optimizer state keeps its
shape and every mapping iteration stays one compiled program.

Semantic extension (sem_gaussian_model.py): per-gaussian stable ``ids`` and
instance ``obj_ids`` ride along through add/prune, so the semantic side sees
the gaussian map exactly like the vanilla point map.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.knn import approx_knn_mean_dist

Array = jax.Array

SH_C0 = 0.28209479177387814


class GaussianState(NamedTuple):
    xyz: Array            # (G, 3) f32 means (world)
    f_dc: Array           # (G, 3) f32 SH DC coefficients
    scales_log: Array     # (G, 3) f32 log-scales
    quats: Array          # (G, 4) f32 wxyz rotations
    opacity_logit: Array  # (G,)   f32 pre-sigmoid opacity
    ids: Array            # (G,)   i32 stable point ids (-1 = free)
    obj_ids: Array        # (G,)   i32 instance ids (-1 = unassigned)
    valid: Array          # (G,)   bool live slots
    next_id: Array        # ()     i32

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    # --- activations (gaussian_model.py get_* properties) ---------------
    def scales(self) -> Array:
        return jnp.exp(self.scales_log)

    def opacity(self) -> Array:
        return jax.nn.sigmoid(self.opacity_logit)

    def colors(self) -> Array:
        """SH DC term -> RGB in [0, 1] (gaussian_model_utils.py SH eval)."""
        return jnp.clip(SH_C0 * self.f_dc + 0.5, 0.0, 1.0)


def init_gaussian_state(capacity: int) -> GaussianState:
    return GaussianState(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        f_dc=jnp.zeros((capacity, 3), jnp.float32),
        scales_log=jnp.full((capacity, 3), -10.0, jnp.float32),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                       (capacity, 1)),
        opacity_logit=jnp.full((capacity,), -10.0, jnp.float32),
        ids=jnp.full((capacity,), -1, jnp.int32),
        obj_ids=jnp.full((capacity,), -1, jnp.int32),
        valid=jnp.zeros((capacity,), bool),
        next_id=jnp.zeros((), jnp.int32),
    )


def rgb_to_sh(rgb: Array) -> Array:
    return (rgb - 0.5) / SH_C0


@jax.jit
def add_points(state: GaussianState, points: Array, colors: Array,
               new_mask: Array) -> GaussianState:
    """Seed gaussians at ``points[new_mask]`` (gaussian_model.py:127-160
    ``add_points``): scale init = log(mean 3-NN distance) isotropic, opacity
    logit ~ sigmoid^-1(0.5), identity rotation. Appends into FREE slots
    (compacted via prefix sums), dropping overflow."""
    free = ~state.valid
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1     # rank among free
    slot_of_rank = jnp.full((state.capacity,), state.capacity, jnp.int32)
    slot_of_rank = slot_of_rank.at[jnp.where(
        free, free_rank, state.capacity)].set(
        jnp.arange(state.capacity, dtype=jnp.int32), mode="drop")

    order = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    n_new = new_mask.astype(jnp.int32).sum()
    dest = slot_of_rank.at[jnp.where(new_mask, order, state.capacity)].get(
        mode="fill", fill_value=state.capacity)

    # scale init from mean NN distance among the incoming batch (the
    # reference calls distCUDA2 on the concatenated cloud; new points
    # dominate their own neighbourhoods, so batch-local kNN suffices)
    nn = approx_knn_mean_dist(points, new_mask, k=3)
    scale = jnp.log(jnp.sqrt(jnp.maximum(nn, 1e-7)))[:, None].repeat(3, 1)

    ids = state.next_id + order
    st = state
    return GaussianState(
        xyz=st.xyz.at[dest].set(points.astype(jnp.float32), mode="drop"),
        f_dc=st.f_dc.at[dest].set(rgb_to_sh(colors.astype(jnp.float32)),
                                  mode="drop"),
        scales_log=st.scales_log.at[dest].set(scale, mode="drop"),
        quats=st.quats.at[dest].set(
            jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                     (points.shape[0], 1)), mode="drop"),
        opacity_logit=st.opacity_logit.at[dest].set(
            jnp.zeros(points.shape[0]), mode="drop"),
        ids=st.ids.at[dest].set(ids.astype(jnp.int32), mode="drop"),
        obj_ids=st.obj_ids.at[dest].set(
            jnp.full((points.shape[0],), -1, jnp.int32), mode="drop"),
        valid=st.valid.at[dest].set(jnp.ones(points.shape[0], bool),
                                    mode="drop"),
        next_id=(st.next_id + n_new).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=())
def prune_by_opacity(state: GaussianState, threshold: float,
                     protect_mask: Array | None = None) -> GaussianState:
    """Clear slots whose opacity fell below ``threshold`` (mapper.py mid/
    final opacity pruning). ``protect_mask`` keeps e.g. this submap's seeds."""
    drop = state.valid & (jax.nn.sigmoid(state.opacity_logit) < threshold)
    if protect_mask is not None:
        drop = drop & ~protect_mask
    return state._replace(valid=state.valid & ~drop,
                          ids=jnp.where(drop, -1, state.ids),
                          obj_ids=jnp.where(drop, -1, state.obj_ids))


@jax.jit
def densify_clone_split(state: GaussianState, grad_avg: Array, key: Array,
                        grad_th: Array, percent_dense: Array
                        ) -> tuple[GaussianState, Array]:
    """Gradient-magnitude densification (reference gaussian_model.py:
    323-409 carries the optimizer-state-aware clone/split machinery of
    gaussian-splatting; NOTE the reference mapper never invokes it -- this
    implements the capability TPU-natively, config-gated).

    Gaussians whose accumulated positional-gradient magnitude exceeds
    ``grad_th`` densify:
      - CLONE (small: max scale <= percent_dense * scene extent): an exact
        copy appends; optimization separates the pair.
      - SPLIT (large): the original is removed and TWO samples drawn from
        its own N(mean, scale) append with scales / 1.6.
    Fixed capacity: appends compact into free slots (drop on overflow), so
    the optimizer state keeps its shape -- the caller zeroes the Adam
    moments of ``appended`` slots (the reference concatenates zero moments
    for new rows the same way).

    Returns (new_state, appended_slot_mask (G,) bool).
    """
    G = state.capacity
    scales = state.scales()
    max_s = scales.max(axis=-1)
    # scene extent: bounding-sphere radius of the live gaussians
    vn = jnp.maximum(state.valid.sum(), 1)
    centroid = (state.xyz * state.valid[:, None]).sum(0) / vn
    extent = jnp.sqrt(jnp.where(
        state.valid, ((state.xyz - centroid) ** 2).sum(-1), 0.0).max())

    sel = state.valid & (grad_avg > grad_th)
    is_split = sel & (max_s > percent_dense * jnp.maximum(extent, 1e-6))
    is_clone = sel & ~is_split

    # split samples from each gaussian's own distribution, in world frame
    w, x, y, z = (state.quats[:, 0], state.quats[:, 1], state.quats[:, 2],
                  state.quats[:, 3])
    rot = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)                                                   # (G, 3, 3)
    eps = jax.random.normal(key, (2, G, 3))
    samp = jnp.einsum("gij,sgj->sgi", rot, eps * scales) + state.xyz
    split_scales = state.scales_log - jnp.log(1.6)           # / (0.8 * 2)

    # candidate row set 1: clone copy OR split sample 1 (exclusive masks)
    cand1_mask = sel
    cand1_xyz = jnp.where(is_split[:, None], samp[0], state.xyz)
    cand1_scl = jnp.where(is_split[:, None], split_scales, state.scales_log)
    # candidate row set 2: split sample 2
    cand2_mask = is_split

    # free slots AFTER removing split originals
    valid2 = state.valid & ~is_split
    free = ~valid2
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    slot_of_rank = jnp.full((G,), G, jnp.int32).at[
        jnp.where(free, free_rank, G)].set(
        jnp.arange(G, dtype=jnp.int32), mode="drop")

    n1 = cand1_mask.astype(jnp.int32).sum()
    rank1 = jnp.cumsum(cand1_mask.astype(jnp.int32)) - 1
    rank2 = n1 + jnp.cumsum(cand2_mask.astype(jnp.int32)) - 1
    dest1 = slot_of_rank.at[jnp.where(cand1_mask, rank1, G)].get(
        mode="fill", fill_value=G)
    dest2 = slot_of_rank.at[jnp.where(cand2_mask, rank2, G)].get(
        mode="fill", fill_value=G)
    n_new = n1 + cand2_mask.astype(jnp.int32).sum()
    ids1 = (state.next_id + rank1).astype(jnp.int32)
    ids2 = (state.next_id + rank2).astype(jnp.int32)

    def put(buf, vals1, vals2):
        out = buf.at[dest1].set(vals1, mode="drop")
        return out.at[dest2].set(vals2, mode="drop")

    st = state
    new_valid = valid2.at[dest1].set(True, mode="drop").at[dest2].set(
        True, mode="drop")
    out = GaussianState(
        xyz=put(st.xyz, cand1_xyz, samp[1]),
        f_dc=put(st.f_dc, st.f_dc, st.f_dc),
        scales_log=put(st.scales_log, cand1_scl, split_scales),
        quats=put(st.quats, st.quats, st.quats),
        opacity_logit=put(st.opacity_logit, st.opacity_logit,
                          st.opacity_logit),
        ids=put(st.ids, ids1, ids2),
        obj_ids=put(st.obj_ids, st.obj_ids, st.obj_ids),  # semantics ride
        valid=new_valid,
        next_id=(st.next_id + n_new).astype(jnp.int32),
    )
    appended = jnp.zeros((G,), bool).at[dest1].set(True, mode="drop") \
        .at[dest2].set(True, mode="drop")
    # slots of removed split originals also carry stale moments
    appended = appended | (state.valid & ~valid2)
    return out, appended


def n_valid(state: GaussianState) -> int:
    return int(state.valid.sum())


# --- checkpoint dicts (sem_gaussian_model.py:33-38 capture layout) -------

def gaussian_map_dict(state: GaussianState) -> dict:
    import numpy as np

    live = np.asarray(state.valid)
    idx = np.nonzero(live)[0]
    return {
        "xyz": np.asarray(state.xyz)[idx],
        "obj_ids": np.asarray(state.obj_ids)[idx].reshape(-1, 1),
        "ids": np.asarray(state.ids)[idx].reshape(-1, 1),
        "max_id": int(state.next_id),
        "color": (np.clip(SH_C0 * np.asarray(state.f_dc)[idx] + 0.5, 0, 1)
                  * 255).astype(np.uint8),
        "f_dc": np.asarray(state.f_dc)[idx],
        "scales_log": np.asarray(state.scales_log)[idx],
        "quats": np.asarray(state.quats)[idx],
        "opacity_logit": np.asarray(state.opacity_logit)[idx],
    }


def from_gaussian_map_dict(d: dict, capacity: int) -> GaussianState:
    import numpy as np

    xyz = np.asarray(d["xyz"], np.float32)
    n = xyz.shape[0]
    if capacity < n:
        raise ValueError(f"capacity {capacity} < checkpoint gaussians {n}")
    st = init_gaussian_state(capacity)
    set_ = lambda arr, key, dt: arr.at[:n].set(  # noqa: E731
        np.asarray(d[key], dt).reshape((n,) + arr.shape[1:]))
    return GaussianState(
        xyz=st.xyz.at[:n].set(xyz),
        f_dc=set_(st.f_dc, "f_dc", np.float32),
        scales_log=set_(st.scales_log, "scales_log", np.float32),
        quats=set_(st.quats, "quats", np.float32),
        opacity_logit=set_(st.opacity_logit, "opacity_logit", np.float32),
        ids=set_(st.ids, "ids", np.int32),
        obj_ids=set_(st.obj_ids, "obj_ids", np.int32),
        valid=st.valid.at[:n].set(True),
        next_id=jnp.asarray(int(d["max_id"]), jnp.int32),
    )


# --------------------------------------------------------------------------
# Gaussian PLY IO (reference sem_gaussian_model.py:59-158 save_ply/load_ply:
# raw parameters as all-f4 vertex properties, obj/instance ids included).
# Written directly as binary_little_endian -- no plyfile in this image.
# --------------------------------------------------------------------------

_PLY_PROPS = ("x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2",
              "opacity", "scale_0", "scale_1", "scale_2",
              "rot_0", "rot_1", "rot_2", "rot_3", "obj_0", "ids")


def save_gaussian_ply(state: GaussianState, path) -> None:
    """Write the live gaussians in the reference's 3DGS ply layout
    (sem_gaussian_model.py:59-95): raw (pre-activation) parameters, zero
    normals, instance id as obj_0 and stable id as ids, every property f4
    like the reference's dtype_full."""
    import os

    import numpy as np

    d = gaussian_map_dict(state)
    n = d["xyz"].shape[0]
    arr = np.zeros(n, dtype=[(p, "<f4") for p in _PLY_PROPS])
    arr["x"], arr["y"], arr["z"] = d["xyz"].T
    for i in range(3):
        arr[f"f_dc_{i}"] = d["f_dc"][:, i]
        arr[f"scale_{i}"] = d["scales_log"][:, i]
    arr["opacity"] = d["opacity_logit"].reshape(-1)
    for i in range(4):
        arr[f"rot_{i}"] = d["quats"][:, i]
    arr["obj_0"] = d["obj_ids"].reshape(-1).astype(np.float32)
    arr["ids"] = d["ids"].reshape(-1).astype(np.float32)

    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {n}\n"
              + "".join(f"property float {p}\n" for p in _PLY_PROPS)
              + "end_header\n")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(arr.tobytes())


def load_gaussian_ply(path, capacity: int) -> GaussianState:
    """Read a gaussian ply written by ``save_gaussian_ply`` (or any 3DGS ply
    with the same sh-degree-0 property set) into a fresh fixed-capacity
    state (sem_gaussian_model.py:97-158)."""
    import numpy as np

    with open(path, "rb") as f:
        props = []
        n = 0
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("format") and "binary_little_endian" not in line:
                raise ValueError(f"unsupported ply format: {line}")
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property"):
                _, typ, name = line.split()
                if typ != "float":
                    raise ValueError(f"unsupported property type {typ}")
                props.append(name)
            elif line == "end_header":
                break
        arr = np.frombuffer(f.read(n * 4 * len(props)),
                            dtype=[(p, "<f4") for p in props])

    col = lambda *names: np.stack([arr[p] for p in names], 1)  # noqa: E731
    d = {
        "xyz": col("x", "y", "z"),
        "f_dc": col("f_dc_0", "f_dc_1", "f_dc_2"),
        "scales_log": col("scale_0", "scale_1", "scale_2"),
        "quats": col("rot_0", "rot_1", "rot_2", "rot_3"),
        "opacity_logit": arr["opacity"],
        "obj_ids": (arr["obj_0"] if "obj_0" in props
                    else -np.ones(n, np.float32)).astype(np.int32),
        "ids": (arr["ids"] if "ids" in props
                else np.arange(n, dtype=np.float32)).astype(np.int32),
    }
    d["max_id"] = int(d["ids"].max()) + 1 if n else 0
    return from_gaussian_map_dict(d, capacity)
