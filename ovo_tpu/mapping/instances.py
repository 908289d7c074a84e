"""Fixed-capacity 3D instance store as a struct-of-arrays pytree.

Replaces the reference's ``Dict[int, Instance3D]`` + per-object Python heaps
(/root/reference/ovo/entities/instance3d.py) with padded device arrays over a
static id space of ``n_instances``:

  - descriptor fusion state: a streaming (sum, count) pair per instance for
    ``avg_pooling`` (the reference's default config fuses ALL views with
    avg_pooling -- the running mean is exactly equivalent), plus optional
    per-view descriptor SLOTS for the medoid fusions / bounded k_top_views.
  - the per-instance "top-k keyframes by mask area" min-heap becomes a
    (K, T) pair of area/kf arrays with vectorized insert-or-replace; heap
    ordering ties (area, kf_id) are reproduced with a fused int64 sort key.

Unbounded mode (k_top_views > slot capacity, e.g. the reference default
10000): every observed keyframe counts as "top", so gating reduces to "was
the instance matched in that keyframe" -- no slot state is needed.

Scatter discipline: batch entries are keyed by instance id; invalid entries
are routed to row == capacity and dropped (``mode="drop"``) so they can never
collide with real rows. Valid entries are unique per call (the per-frame mask
fusion guarantees at most one observation per instance per keyframe).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# heap keys: area * 2^20 + kf reproduces heapq's (area, kf_id) tuple order
_KF_BITS = 20


def _heap_key(area: Array, kf: Array) -> Array:
    key = area.astype(jnp.int64) * (1 << _KF_BITS) + kf.astype(jnp.int64)
    return jnp.where(area < 0, jnp.int64(-1) << 62, key)


class InstanceStore(NamedTuple):
    active: Array        # (K,) bool -- id minted and not deleted
    clip_feature: Array  # (K, D) f32 current fused descriptor
    has_clip: Array      # (K,) bool
    desc_sum: Array      # (K, D) f32 streaming sum (avg_pooling fusion)
    desc_cnt: Array      # (K,) i32 number of fused views
    n_points: Array      # (K,) i32 diagnostic: points ever matched
    top_area: Array      # (K, T) i32 mask area per top-kf slot, -1 empty
    top_kf: Array        # (K, T) i32 keyframe id per slot, -1 empty
    slot_desc: Array     # (K, T, D) f32 per-view descriptors (medoid fusion)
    slot_valid: Array    # (K, T) bool
    next_id: Array       # () i32

    @property
    def capacity(self) -> int:
        return self.active.shape[0]

    @property
    def n_slots(self) -> int:
        return self.top_area.shape[1]


def init_instance_store(n_instances: int, clip_dim: int, n_slots: int = 16,
                        store_slot_descs: bool = False) -> InstanceStore:
    K, T, D = n_instances, n_slots, clip_dim
    return InstanceStore(
        active=jnp.zeros((K,), jnp.bool_),
        clip_feature=jnp.zeros((K, D), jnp.float32),
        has_clip=jnp.zeros((K,), jnp.bool_),
        desc_sum=jnp.zeros((K, D), jnp.float32),
        desc_cnt=jnp.zeros((K,), jnp.int32),
        n_points=jnp.zeros((K,), jnp.int32),
        top_area=jnp.full((K, T), -1, jnp.int32),
        top_kf=jnp.full((K, T), -1, jnp.int32),
        slot_desc=jnp.zeros((K, T, D) if store_slot_descs else (K, 1, D),
                            jnp.float32),
        slot_valid=jnp.zeros((K, T) if store_slot_descs else (K, 1), jnp.bool_),
        next_id=jnp.zeros((), jnp.int32),
    )


def grow_instance_store(store: InstanceStore, new_capacity: int
                        ) -> InstanceStore:
    """Re-pad every per-instance buffer to a larger capacity bucket.

    The reference mints instances unbounded (a Python dict,
    /root/reference/ovo/entities/ovo.py:271-276); the TPU store is a fixed
    id space, so callers grow it in power-of-2 buckets BEFORE a keyframe
    could overflow it (SemanticMapper._associate) -- each bucket
    re-specializes the jitted association program once, exactly like
    map_state.grow_map_state does for the point axis. Ids are stable:
    growth only appends empty rows."""
    if new_capacity <= store.capacity:
        return store
    pad = new_capacity - store.capacity
    T, D = store.n_slots, store.clip_feature.shape[1]
    Ts = store.slot_valid.shape[1]

    def z(shape, dtype, fill=0):
        return jnp.full(shape, fill, dtype) if fill else jnp.zeros(shape,
                                                                   dtype)

    return InstanceStore(
        active=jnp.concatenate([store.active, z((pad,), jnp.bool_)]),
        clip_feature=jnp.concatenate(
            [store.clip_feature, z((pad, D), jnp.float32)]),
        has_clip=jnp.concatenate([store.has_clip, z((pad,), jnp.bool_)]),
        desc_sum=jnp.concatenate([store.desc_sum, z((pad, D), jnp.float32)]),
        desc_cnt=jnp.concatenate([store.desc_cnt, z((pad,), jnp.int32)]),
        n_points=jnp.concatenate([store.n_points, z((pad,), jnp.int32)]),
        top_area=jnp.concatenate(
            [store.top_area, z((pad, T), jnp.int32, -1)]),
        top_kf=jnp.concatenate([store.top_kf, z((pad, T), jnp.int32, -1)]),
        slot_desc=jnp.concatenate(
            [store.slot_desc, z((pad, store.slot_desc.shape[1], D),
                                jnp.float32)]),
        slot_valid=jnp.concatenate(
            [store.slot_valid, z((pad, Ts), jnp.bool_)]),
        next_id=store.next_id,
    )


def _rows(store: InstanceStore, ins_ids: Array, valid: Array) -> Tuple[Array, Array, Array]:
    """(scatter_rows, gather_rows, effective_valid)."""
    v = valid & (ins_ids >= 0) & (ins_ids < store.capacity)
    scatter = jnp.where(v, ins_ids, store.capacity)
    gather = jnp.clip(ins_ids, 0, store.capacity - 1)
    return scatter, gather, v


# ---------------------------------------------------------------------------
# Top-k keyframe bookkeeping
# ---------------------------------------------------------------------------

def add_top_kf(store: InstanceStore, ins_ids: Array, kf_id: Array,
               areas: Array, valid: Array) -> InstanceStore:
    """Vectorized add_top_kf over a batch of matched instances
    (instance3d.py:105-134): update-in-place if the kf already holds a slot
    and the new area is larger, else insert into the minimum (area, kf) slot
    when the new entry compares greater."""
    scatter, gather, v = _rows(store, ins_ids, valid)

    g_area = store.top_area[gather]       # (B, T)
    g_kf = store.top_kf[gather]
    keys = _heap_key(g_area, g_kf)        # (B, T)
    min_idx = jnp.argmin(keys, axis=1)    # (B,)
    min_key = jnp.take_along_axis(keys, min_idx[:, None], axis=1)[:, 0]
    exists = g_kf == kf_id                # (B, T)
    has_kf = jnp.any(exists, axis=1)
    exist_idx = jnp.argmax(exists, axis=1)
    exist_area = jnp.take_along_axis(g_area, exist_idx[:, None], axis=1)[:, 0]

    new_key = _heap_key(areas, jnp.full_like(areas, kf_id))
    bump = has_kf & (areas > exist_area)
    enter = (~has_kf) & (new_key > min_key)
    col = jnp.where(has_kf, exist_idx, min_idx)
    write = v & (bump | enter)

    row_w = jnp.where(write, scatter, store.capacity)
    top_area = store.top_area.at[row_w, col].set(areas, mode="drop")
    top_kf = store.top_kf.at[row_w, col].set(
        jnp.full_like(areas, kf_id), mode="drop")

    # replacing a slot invalidates any stored per-view descriptor there
    sv_col = jnp.minimum(col, store.slot_valid.shape[1] - 1)
    row_inv = jnp.where(v & enter, scatter, store.capacity)
    slot_valid = store.slot_valid.at[row_inv, sv_col].set(False, mode="drop")
    return store._replace(top_area=top_area, top_kf=top_kf,
                          slot_valid=slot_valid)


def is_top_kf(store: InstanceStore, ins_ids: Array, kf_id: Array) -> Array:
    """(B,) bool: is ``kf_id`` among each instance's top slots."""
    gather = jnp.clip(ins_ids, 0, store.capacity - 1)
    return jnp.any(store.top_kf[gather] == kf_id, axis=1) & (ins_ids >= 0)


# ---------------------------------------------------------------------------
# Descriptor fusion
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("fusion",),
                   donate_argnums=(0,))
def update_descriptors(store: InstanceStore, ins_ids: Array, descs: Array,
                       kf_id: Array, valid: Array, *,
                       fusion: str = "avg_pooling") -> InstanceStore:
    """Fold one keyframe's per-instance CLIP descriptors into the store.

    DONATION CONTRACT: ``store`` is donated -- on TPU its buffers back the
    returned store and the input is invalid after the call; pass
    ``jax.tree_util.tree_map(jnp.copy, store)`` to keep it. CPU ignores
    donation, so only real-TPU use catches violations.

    avg_pooling: running mean (exact for the reference's default config where
    k_top_views exceeds the run length, so every computed view participates).
    l1_medoid / cossim_medoid: descriptors also land in the kf's slot; the
    fused feature is recomputed as the medoid over valid slots
    (instance3d.py:9-17).
    """
    scatter, gather, v = _rows(store, ins_ids, valid)
    desc_sum = store.desc_sum.at[scatter].add(descs, mode="drop")
    desc_cnt = store.desc_cnt.at[scatter].add(1, mode="drop")
    store = store._replace(desc_sum=desc_sum, desc_cnt=desc_cnt)

    if fusion == "avg_pooling":
        cnt = jnp.maximum(store.desc_cnt[gather], 1)[:, None]
        fused = store.desc_sum[gather] / cnt
        clip_feature = store.clip_feature.at[scatter].set(fused, mode="drop")
        has_clip = store.has_clip.at[scatter].max(True, mode="drop")
        return store._replace(clip_feature=clip_feature, has_clip=has_clip)

    T = store.n_slots
    if store.slot_desc.shape[1] != T:
        raise ValueError("medoid fusion requires store_slot_descs=True")

    in_slot = store.top_kf[gather] == kf_id          # (B, T)
    slot_idx = jnp.argmax(in_slot, axis=1)
    v2 = v & jnp.any(in_slot, axis=1)
    row2 = jnp.where(v2, scatter, store.capacity)
    slot_desc = store.slot_desc.at[row2, slot_idx].set(descs, mode="drop")
    slot_valid = store.slot_valid.at[row2, slot_idx].set(True, mode="drop")
    store = store._replace(slot_desc=slot_desc, slot_valid=slot_valid)

    fused, ok = jax.vmap(lambda sd, sv: _medoid(sd, sv, fusion))(
        store.slot_desc[gather], store.slot_valid[gather])
    row3 = jnp.where(v & ok, scatter, store.capacity)
    clip_feature = store.clip_feature.at[row3].set(fused, mode="drop")
    has_clip = store.has_clip.at[row3].max(True, mode="drop")
    return store._replace(clip_feature=clip_feature, has_clip=has_clip)


@functools.partial(jax.jit, static_argnames=("fusion",),
                   donate_argnums=(0,))
def drop_keyframe_descriptors(store: InstanceStore, ins_ids: Array,
                              descs: Array, valid: Array, culled_kfs: Array,
                              *, fusion: str = "avg_pooling"
                              ) -> InstanceStore:
    """Remove culled keyframes' contributions from the store and re-fuse.

    Mirrors the reference's deleted-keyframe hygiene in OVO.update_map
    (/root/reference/ovo/entities/ovo.py:372-379 + update_objects_clip at
    :423): per-(kf, instance) descriptors of deleted keyframes are dropped
    and every instance's fused feature is recomputed from the survivors.

    DONATION CONTRACT: ``store`` is donated (consumed); see
    update_descriptors.

    Args:
      ins_ids / descs / valid: the concatenated per-(kf, instance)
        descriptor batch of ALL culled keyframes ((B,), (B, D), (B,));
        invalid rows are ignored.
      culled_kfs: (C,) i32 culled keyframe ids, padded with -2 (never
        matches a slot: -1 means empty).
    """
    scatter, _, v = _rows(store, ins_ids, valid)
    desc_sum = store.desc_sum.at[scatter].add(
        jnp.where(v[:, None], -descs, 0.0), mode="drop")
    desc_cnt = jnp.maximum(
        store.desc_cnt.at[scatter].add(jnp.where(v, -1, 0), mode="drop"), 0)

    # evict culled keyframes from every instance's top-kf slots (a culled
    # kf may hold a slot even without a computed descriptor)
    hit = jnp.any(store.top_kf[:, :, None] == culled_kfs[None, None, :],
                  axis=-1)
    top_area = jnp.where(hit, -1, store.top_area)
    top_kf = jnp.where(hit, -1, store.top_kf)
    slot_valid = store.slot_valid & ~hit[:, :store.slot_valid.shape[1]]
    store = store._replace(desc_sum=desc_sum, desc_cnt=desc_cnt,
                           top_area=top_area, top_kf=top_kf,
                           slot_valid=slot_valid)

    if fusion == "avg_pooling":
        cnt = jnp.maximum(store.desc_cnt, 1)[:, None]
        fused = store.desc_sum / cnt
        has = store.desc_cnt > 0
        return store._replace(
            clip_feature=jnp.where(has[:, None], fused, 0.0),
            has_clip=store.has_clip & has)

    fused, ok = jax.vmap(lambda sd, sv: _medoid(sd, sv, fusion))(
        store.slot_desc, store.slot_valid)
    return store._replace(
        clip_feature=jnp.where(ok[:, None], fused, 0.0),
        has_clip=store.has_clip & ok)


def _medoid(descs: Array, valid: Array, fusion: str) -> Tuple[Array, Array]:
    """Medoid over valid rows of (T, D): l1_medoid minimizes summed L1
    distance; cossim_medoid maximizes summed cosine similarity
    (instance3d.py:9-17). Returns (fused, any_valid)."""
    vf = valid.astype(descs.dtype)
    if fusion == "l1_medoid":
        d = jnp.sum(jnp.abs(descs[:, None, :] - descs[None, :, :]), axis=-1)
        d = d * vf[None, :]
        score = jnp.where(valid, -jnp.sum(d, axis=1), -jnp.inf)
    elif fusion == "cossim_medoid":
        norm = jnp.linalg.norm(descs, axis=-1, keepdims=True)
        unit = descs / jnp.maximum(norm, 1e-12)
        sim = unit @ unit.T
        sim = sim * vf[None, :]
        score = jnp.where(valid, jnp.sum(sim, axis=1), -jnp.inf)
    else:
        raise NotImplementedError(fusion)
    idx = jnp.argmax(score)
    return descs[idx], jnp.any(valid)


# ---------------------------------------------------------------------------
# Instance minting / bookkeeping
# ---------------------------------------------------------------------------

def mint_instances(store: InstanceStore, n_new: Array) -> InstanceStore:
    """Activate ids [next_id, next_id + n_new); the association program
    assigns them in mask order (matching the reference's sequential minting,
    ovo.py:271-276)."""
    ids = jnp.arange(store.capacity)
    newly = (ids >= store.next_id) & (ids < store.next_id + n_new)
    return store._replace(
        active=store.active | newly,
        next_id=jnp.minimum(store.next_id + n_new,
                            store.capacity).astype(jnp.int32))


def add_matched_points(store: InstanceStore, ins_ids: Array, counts: Array,
                       valid: Array) -> InstanceStore:
    scatter, _, v = _rows(store, ins_ids, valid)
    return store._replace(
        n_points=store.n_points.at[scatter].add(counts, mode="drop"))
