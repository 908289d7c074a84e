"""Semantic loop-closure map update.

Reference behavior: OVO.update_map (/root/reference/ovo/entities/ovo.py:366-424):
on a SLAM "big change" (loop closure / global BA), (1) drop instances whose
point support vanished, (2) brute-force pairwise-fuse instances passing a
3-stage gate (centroid distance, descriptor cosine, point-overlap fraction),
(3) remap ids and refresh descriptors.

TPU redesign: the O(K^2) gate matrix is computed in ONE device program
(segment-mean centroids, normalized-feature gram matrix, sampled
point-overlap for the surviving candidate pairs); only the tiny sequential
union-resolution -- whose greedy order the reference semantics prescribe --
runs on host over the (typically < 100) gated pairs.

Deviation noted for parity review: the reference's point-overlap test runs
open3d's exact nearest-neighbour distance over FULL point sets; here each
instance is represented by up to ``sample`` points (deterministic: first in
buffer order). The fraction-of-close-points statistic is stable under this
subsampling for the >= 100-point instances that reach this stage.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .instances import InstanceStore, _heap_key
from .map_state import MapState

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("sample",))
def _gate_and_sample(map_state: MapState, store: InstanceStore,
                     th_centroid: float, th_cossim: float, *,
                     sample: int = 512):
    """Device program: per-instance support counts, centroids, candidate-pair
    gates, and a deterministic point sample per instance."""
    K = store.capacity
    obj = map_state.obj_ids
    valid_pt = map_state.valid_mask()
    row = jnp.where(valid_pt & (obj >= 0), obj, K)

    counts = jnp.zeros((K,), jnp.int32).at[row].add(1, mode="drop")
    sums = jnp.zeros((K, 3), jnp.float32).at[row].add(
        map_state.points, mode="drop")
    centroids = sums / jnp.maximum(counts, 1)[:, None].astype(jnp.float32)

    alive = store.active & (counts > 0)

    # centroid gate (K, K)
    d2 = jnp.sum((centroids[:, None, :] - centroids[None, :, :]) ** 2, axis=-1)
    gate_c = jnp.sqrt(jnp.maximum(d2, 0.0)) <= th_centroid

    # descriptor cosine gate
    feat = store.clip_feature
    unit = feat / jnp.maximum(jnp.linalg.norm(feat, axis=-1, keepdims=True),
                              1e-12)
    cos = jax.lax.dot_general(unit, unit, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    pair_ok = (alive & store.has_clip)[:, None] & (alive & store.has_clip)[None, :]
    gate = gate_c & (cos >= th_cossim) & pair_ok
    gate = gate & (jnp.arange(K)[:, None] < jnp.arange(K)[None, :])  # i < j
    return counts, centroids, alive, gate, cos


def _sample_instance_points(obj: np.ndarray, points: np.ndarray, ins_id: int,
                            sample: int) -> np.ndarray:
    sel = np.where(obj == ins_id)[0][:sample]
    return points[sel]


@functools.partial(jax.jit, static_argnames=())
def _pair_overlap(p1: Array, n1: Array, p2: Array, n2: Array,
                  th_points: float) -> Array:
    """Fraction of p1's first n1 points within th_points of p2[:n2]
    (instance_utils.py:18-24 semantics, sampled)."""
    S = p1.shape[0]
    d2 = jnp.sum((p1[:, None, :] - p2[None, :, :]) ** 2, axis=-1)
    col_ok = jnp.arange(p2.shape[0])[None, :] < n2
    d2 = jnp.where(col_ok, d2, jnp.inf)
    mind = jnp.sqrt(jnp.min(d2, axis=1))
    row_ok = jnp.arange(S) < n1
    close = (mind < th_points) & row_ok
    return jnp.sum(close.astype(jnp.float32)) / jnp.maximum(n1, 1)


def semantic_loop_closure(map_state: MapState, store: InstanceStore,
                          th_centroid: float = 1.5, th_cossim: float = 0.81,
                          th_points: float = 0.1, sample: int = 512
                          ) -> Tuple[MapState, InstanceStore, Dict[int, int]]:
    """Returns (map_state, store, fused: {deleted_id: surviving_id})."""
    K = store.capacity
    counts, centroids, alive, gate, cos = _gate_and_sample(
        map_state, store, th_centroid, th_cossim, sample=sample)

    alive_np = np.asarray(alive)
    gate_np = np.asarray(gate)
    cos_np = np.asarray(cos)

    # candidate pairs i < j in id order (reference iterates objects in key
    # order and greedily consumes, ovo.py:400-409)
    cand = np.argwhere(gate_np)
    obj_np = np.asarray(map_state.obj_ids)
    pts_np = np.asarray(map_state.points)

    fused: Dict[int, int] = {}
    pair_cache: Dict[int, np.ndarray] = {}

    def sample_of(iid):
        if iid not in pair_cache:
            pair_cache[iid] = _sample_instance_points(obj_np, pts_np, iid, sample)
        return pair_cache[iid]

    for i, j in cand:
        i, j = int(i), int(j)
        if i in fused or j in fused:
            continue
        p1, p2 = sample_of(i), sample_of(j)
        if len(p1) == 0 or len(p2) == 0:
            continue
        # fixed padding -> _pair_overlap compiles exactly once
        pad1 = np.zeros((sample, 3), np.float32)
        pad1[:len(p1)] = p1
        pad2 = np.zeros((sample, 3), np.float32)
        pad2[:len(p2)] = p2
        p_dist = float(_pair_overlap(
            jnp.asarray(pad1), jnp.asarray(len(p1)), jnp.asarray(pad2),
            jnp.asarray(len(p2)), th_points))
        c = cos_np[i, j]
        if p_dist > 0.5 or (c > 0.9 and p_dist > 0.2):
            fused[j] = i  # j merges into i (i keeps iterating, like ref)

    dead = np.where(np.asarray(store.active) & ~alive_np)[0]

    map_state, store = apply_fusion(map_state, store, fused,
                                    dead_ids=dead.tolist())
    if fused or len(dead):
        print(f"Semantic Map update: removed {len(dead)}, fused {len(fused)} "
              "instances")
    return map_state, store, fused


def apply_fusion(map_state: MapState, store: InstanceStore,
                 fused: Dict[int, int], dead_ids=()) -> Tuple[MapState, InstanceStore]:
    """Apply an id-remap table on device: relabel the point buffer, merge
    descriptor statistics and top-kf slots, deactivate dead/merged ids."""
    K = store.capacity
    remap = np.arange(K, dtype=np.int32)
    for j, i in fused.items():
        remap[j] = i
    # chase chains (a->b, b->c)
    for _ in range(4):
        remap = remap[remap]
    remap_j = jnp.asarray(remap)

    obj = map_state.obj_ids
    new_obj = jnp.where(obj >= 0, remap_j[jnp.clip(obj, 0, K - 1)], obj)
    map_state = map_state._replace(obj_ids=new_obj)

    if fused:
        src_np = np.fromiter(fused.keys(), np.int32)
        src = jnp.asarray(src_np)
        dst = jnp.asarray(remap[src_np])  # chase chains to the final survivor
        store = store._replace(
            desc_sum=store.desc_sum.at[dst].add(store.desc_sum[src]),
            desc_cnt=store.desc_cnt.at[dst].add(store.desc_cnt[src]),
            n_points=store.n_points.at[dst].add(store.n_points[src]),
            active=store.active.at[src].set(False),
        )
        # merge top-kf slots: per surviving id, pool its slots with all its
        # absorbed instances' slots and keep the top-T by (area, kf) key --
        # same outcome as replaying add_top_kf over the absorbed entries
        # (instance_utils.py:32-33). Host-side: a handful of tiny arrays.
        T = store.n_slots
        area_np = np.array(store.top_area)  # writable copies
        kf_np = np.array(store.top_kf)
        groups: dict = {}
        for s in src_np.tolist():
            groups.setdefault(int(remap[s]), []).append(int(s))
        for d, srcs in groups.items():
            pool = np.concatenate(
                [np.stack([area_np[r], kf_np[r]], axis=1)
                 for r in [d] + srcs])
            pool = pool[pool[:, 0] >= 0]
            order = np.lexsort((pool[:, 1], pool[:, 0]))[::-1][:T]
            sel = pool[order]
            area_np[d] = -1
            kf_np[d] = -1
            area_np[d, :len(sel)] = sel[:, 0]
            kf_np[d, :len(sel)] = sel[:, 1]
        store = store._replace(top_area=jnp.asarray(area_np),
                               top_kf=jnp.asarray(kf_np))
        # refresh fused descriptor = running mean of merged sums (the
        # reference calls update_objects_clip at the end, ovo.py:423)
        cnt = jnp.maximum(store.desc_cnt[dst], 1)[:, None]
        store = store._replace(
            clip_feature=store.clip_feature.at[dst].set(
                store.desc_sum[dst] / cnt),
            has_clip=store.has_clip.at[dst].max(store.desc_cnt[dst] > 0),
        )

    if len(dead_ids):
        dead = jnp.asarray(np.asarray(dead_ids, np.int32))
        store = store._replace(active=store.active.at[dead].set(False))
    return map_state, store
