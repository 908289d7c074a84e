"""Sharded device programs: point-axis-sharded association and dp-batched
keyframe encoding.

Association redesign for multi-chip: the map's point buffer (the largest
state, millions of points) shards across the mesh's dp axis. Each shard
locally culls/projects/matches ITS points and produces partial per-mask vote
matrices; one psum over the (M, K) votes + counts reconstructs the exact
global majority decision, after which every shard relabels its own points
locally. Collectives ride ICI; nothing else moves.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import geometry as geo

Array = jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "match_distance_th", "track_th",
                     "n_masks", "n_instances"))
def sharded_vote_step(mesh: Mesh, points: Array, obj_ids: Array, valid: Array,
                      seg_map: Array, depth: Array, c2w: Array, K: Array, *,
                      axis: str = "dp", match_distance_th: float = 0.05,
                      track_th: int = 100, n_masks: int = 96,
                      n_instances: int = 1024
                      ) -> Tuple[Array, Array, Array, Array]:
    """Point-sharded geometric association votes.

    points (N, 3) / obj_ids (N,) / valid (N,) sharded over ``axis``;
    seg_map/depth/camera replicated. Returns replicated
    (total (M,), assigned (M,), votes (M, K), per-point seg assignment
    (N,) sharded) -- the caller applies the same mask-decision logic as the
    single-chip path.
    """
    M, Kcap = n_masks, n_instances

    def local(points, obj_ids, valid, seg_map, depth, c2w, Kmat):
        corners = geo.compute_camera_frustum_corners(depth, c2w, Kmat)
        in_frustum = geo.points_in_frustum(points, corners, valid=valid)
        matched, uv = geo.match_points_to_depth(
            depth, jnp.linalg.inv(c2w), points, Kmat, match_distance_th,
            valid=in_frustum)
        Hr, Wr = seg_map.shape
        u = jnp.clip(uv[:, 0], 0, Wr - 1)
        v = jnp.clip(uv[:, 1], 0, Hr - 1)
        seg = jnp.where(matched, seg_map[v, u], -1)
        seg = jnp.where((seg >= 0) & (seg < M), seg, -1)
        seg_row = jnp.where(seg >= 0, seg, M)
        ones = jnp.ones_like(seg_row)
        total = jnp.zeros((M,), jnp.int32).at[seg_row].add(ones, mode="drop")
        assigned = obj_ids >= 0
        assigned_cnt = jnp.zeros((M,), jnp.int32).at[seg_row].add(
            (assigned & (seg >= 0)).astype(jnp.int32), mode="drop")
        col = jnp.where(assigned & (seg >= 0),
                        jnp.clip(obj_ids, 0, Kcap - 1), Kcap)
        votes = jnp.zeros((M, Kcap), jnp.int32).at[seg_row, col].add(
            1, mode="drop")
        # exact global counts via one psum over ICI
        total = jax.lax.psum(total, axis)
        assigned_cnt = jax.lax.psum(assigned_cnt, axis)
        votes = jax.lax.psum(votes, axis)
        return total, assigned_cnt, votes, seg

    spec_pt = P(axis)
    rep = P()
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec_pt, spec_pt, spec_pt, rep, rep, rep, rep),
        out_specs=(rep, rep, rep, spec_pt),
    )(points, obj_ids, valid, seg_map, depth, c2w, K)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "match_distance_th", "track_th",
                     "n_masks", "n_instances"))
def sharded_associate_step(mesh: Mesh, points: Array, obj_ids: Array,
                           valid: Array, seg_map: Array, mask_valid: Array,
                           depth: Array, c2w: Array, K: Array,
                           next_id: Array, *,
                           axis: str = "dp",
                           match_distance_th: float = 0.05,
                           track_th: int = 100, n_masks: int = 96,
                           n_instances: int = 1024
                           ) -> Tuple[Array, Array, Array]:
    """The COMPLETE per-keyframe association over a point-sharded map
    (BASELINE config 5 / SURVEY 5.7's sequence-parallel analogue): each
    shard culls/projects/matches its own points and produces partial vote
    matrices; ONE psum over ICI reconstructs the exact global counts; every
    shard then computes the identical mask decisions (majority vote, new-
    instance minting by prefix sum over ``next_id``) and relabels its own
    points locally. Nothing but the (M, K) vote matrix ever crosses chips.

    Returns (new_obj_ids sharded over ``axis``, ins_of_mask (M,) replicated,
    n_new () replicated). Decision math matches associate_keyframe exactly
    (same track_th gating, capacity clipping, tie-breaks).
    """
    M, Kcap = n_masks, n_instances

    def local(points, obj_ids, valid, seg_map, mask_valid, depth, c2w,
              Kmat, next_id):
        corners = geo.compute_camera_frustum_corners(depth, c2w, Kmat)
        in_frustum = geo.points_in_frustum(points, corners, valid=valid)
        matched, uv = geo.match_points_to_depth(
            depth, jnp.linalg.inv(c2w), points, Kmat, match_distance_th,
            valid=in_frustum)
        Hr, Wr = seg_map.shape
        u = jnp.clip(uv[:, 0], 0, Wr - 1)
        v = jnp.clip(uv[:, 1], 0, Hr - 1)
        seg = jnp.where(matched, seg_map[v, u], -1)
        seg = jnp.where((seg >= 0) & (seg < M)
                        & mask_valid[jnp.clip(seg, 0, M - 1)], seg, -1)
        seg_row = jnp.where(seg >= 0, seg, M)
        assigned = obj_ids >= 0
        total = jnp.zeros((M,), jnp.int32).at[seg_row].add(1, mode="drop")
        assigned_cnt = jnp.zeros((M,), jnp.int32).at[seg_row].add(
            (assigned & (seg >= 0)).astype(jnp.int32), mode="drop")
        col = jnp.where(assigned & (seg >= 0),
                        jnp.clip(obj_ids, 0, Kcap - 1), Kcap)
        votes = jnp.zeros((M, Kcap), jnp.int32).at[seg_row, col].add(
            1, mode="drop")
        total = jax.lax.psum(total, axis)
        assigned_cnt = jax.lax.psum(assigned_cnt, axis)
        votes = jax.lax.psum(votes, axis)

        # identical (replicated) decisions on every shard -- the same math
        # as association.associate_keyframe (ovo.py:255-280 semantics)
        unassigned_cnt = total - assigned_cnt
        mode_id = jnp.argmax(votes, axis=1).astype(jnp.int32)
        observed = mask_valid & (total > track_th)
        case_track = observed & (assigned_cnt > track_th)
        case_new = observed & ~case_track & (unassigned_cnt > track_th)
        new_rank = jnp.cumsum(case_new.astype(jnp.int32)) - 1
        new_id = next_id + new_rank
        case_new = case_new & (new_id < Kcap)
        ins_of_mask = jnp.where(
            case_track, mode_id,
            jnp.where(case_new, new_id, -1)).astype(jnp.int32)
        n_new = jnp.sum(case_new.astype(jnp.int32))

        # local relabel of this shard's points
        point_ins = jnp.where(
            seg >= 0, ins_of_mask[jnp.clip(seg, 0, M - 1)], -1)
        new_obj = jnp.where((~assigned) & (point_ins >= 0), point_ins,
                            obj_ids)
        return new_obj, ins_of_mask, n_new

    spec_pt = P(axis)
    rep = P()
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec_pt, spec_pt, spec_pt, rep, rep, rep, rep, rep, rep),
        out_specs=(spec_pt, rep, rep),
    )(points, obj_ids, valid, seg_map, mask_valid, depth, c2w, K, next_id)


def apply_mask_decisions(obj_ids: Array, seg: Array, ins_of_mask: Array
                         ) -> Array:
    """Relabel unassigned matched points from the (replicated) per-mask
    decisions; runs shard-local (pure elementwise)."""
    M = ins_of_mask.shape[0]
    point_ins = jnp.where(seg >= 0, ins_of_mask[jnp.clip(seg, 0, M - 1)], -1)
    return jnp.where((obj_ids < 0) & (point_ins >= 0), point_ins, obj_ids)


def dp_batched_embed(mesh: Mesh, embed_fn, images: Array, masks: Array,
                     valid: Array, axis: str = "dp") -> Array:
    """Replicated-encoder, batch-sharded keyframe embedding: images
    (B, H, W, 3), masks (B, M, H, W), valid (B, M) sharded on ``axis``;
    embed_fn maps one keyframe -> (M, D). The model params are closed over
    (replicated)."""
    images = jax.device_put(images, NamedSharding(mesh, P(axis)))
    masks = jax.device_put(masks, NamedSharding(mesh, P(axis)))
    valid = jax.device_put(valid, NamedSharding(mesh, P(axis)))

    @jax.jit
    def run(images, masks, valid):
        return jax.vmap(embed_fn)(images, masks, valid)

    return run(images, masks, valid)
