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
from ..mapping.association import _vote_matmul, mask_decisions

Array = jax.Array


def _local_votes(points, obj_ids, valid, seg_map, mask_valid, depth, c2w,
                 Kmat, *, axis, match_distance_th, M, Kcap,
                 rgb_depth_ratio=None):
    """Shard-local cull/project/match + partial vote matrix, psum'd to the
    exact global (M+1, Kcap+1) counts. Uses the same chunked one-hot MXU
    matmuls as the single-chip path (ops/segment_mxu rationale) -- they are
    shard-local ops, so they vectorize under shard_map unchanged.

    Returns (votes_full replicated, seg (N_shard,) local)."""
    corners = geo.compute_camera_frustum_corners(depth, c2w, Kmat)
    in_frustum = geo.points_in_frustum(points, corners, valid=valid)
    matched, uv = geo.match_points_to_depth(
        depth, jnp.linalg.inv(c2w), points, Kmat, match_distance_th,
        valid=in_frustum)
    Hr, Wr = seg_map.shape
    if rgb_depth_ratio is not None:
        # depth-res pixel -> RGB-res segmentation pixel (association.py
        # rgb_depth_ratio remap, reference ovo.py:218-221)
        r_h, r_w, crop_edge = rgb_depth_ratio
        u = ((uv[:, 0] + crop_edge).astype(jnp.float32)
             * r_w).astype(jnp.int32)
        v = ((uv[:, 1] + crop_edge).astype(jnp.float32)
             * r_h).astype(jnp.int32)
        u = jnp.clip(u, 0, Wr - 1)
        v = jnp.clip(v, 0, Hr - 1)
    else:
        u = jnp.clip(uv[:, 0], 0, Wr - 1)
        v = jnp.clip(uv[:, 1], 0, Hr - 1)
    # flat 4-column gather (geo.packed_pixel_table): seg ids <= M are
    # exact in f32
    seg_g = geo.packed_pixel_table(seg_map.astype(jnp.float32))[
        v * Wr + u, 0].astype(jnp.int32)
    seg = jnp.where(matched, seg_g, -1)
    if mask_valid is not None:
        seg = jnp.where((seg >= 0) & (seg < M)
                        & mask_valid[jnp.clip(seg, 0, M - 1)], seg, -1)
    else:
        seg = jnp.where((seg >= 0) & (seg < M), seg, -1)
    seg_row = jnp.where(seg >= 0, seg, M)
    assigned = obj_ids >= 0
    vote_col = jnp.where(assigned & (seg >= 0),
                         jnp.clip(obj_ids, 0, Kcap - 1), Kcap)
    votes_full = _vote_matmul(seg_row, vote_col, M, Kcap, vary_axis=axis)
    votes_full = jax.lax.psum(votes_full, axis)  # ONE collective over ICI
    n_matched = jax.lax.psum(jnp.sum(matched.astype(jnp.int32)), axis)
    return votes_full, seg, n_matched


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
        votes_full, seg, _ = _local_votes(
            points, obj_ids, valid, seg_map, None, depth, c2w, Kmat,
            axis=axis, match_distance_th=match_distance_th, M=M, Kcap=Kcap)
        total = votes_full[:M].sum(axis=1).astype(jnp.int32)
        votes = votes_full[:M, :Kcap].astype(jnp.int32)
        assigned_cnt = votes.sum(axis=1)
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
                     "n_masks", "n_instances", "rgb_depth_ratio"))
def sharded_associate_step(mesh: Mesh, points: Array, obj_ids: Array,
                           valid: Array, seg_map: Array, mask_valid: Array,
                           depth: Array, c2w: Array, K: Array,
                           next_id: Array, *,
                           axis: str = "dp",
                           match_distance_th: float = 0.05,
                           track_th: int = 100, n_masks: int = 96,
                           n_instances: int = 1024,
                           rgb_depth_ratio=None
                           ) -> Tuple[Array, Array, Array]:
    """The COMPLETE per-keyframe association over a point-sharded map
    (BASELINE config 5 / SURVEY 5.7's sequence-parallel analogue): each
    shard culls/projects/matches its own points and produces partial vote
    matrices; ONE psum over ICI reconstructs the exact global counts; every
    shard then computes the identical mask decisions (majority vote, new-
    instance minting by prefix sum over ``next_id``) and relabels its own
    points locally. Nothing but the (M, K) vote matrix ever crosses chips.

    Returns (new_obj_ids sharded over ``axis``, ins_of_mask (M,) replicated,
    n_new, n_dropped, unassigned_cnt (M,), n_matched -- all replicated).
    Decision math matches associate_keyframe exactly (same track_th gating,
    capacity clipping, tie-breaks).
    """
    M, Kcap = n_masks, n_instances

    def local(points, obj_ids, valid, seg_map, mask_valid, depth, c2w,
              Kmat, next_id):
        votes_full, seg, n_matched = _local_votes(
            points, obj_ids, valid, seg_map, mask_valid, depth, c2w, Kmat,
            axis=axis, match_distance_th=match_distance_th, M=M, Kcap=Kcap,
            rgb_depth_ratio=rgb_depth_ratio)
        # identical (replicated) decisions on every shard: the SAME helper
        # the single-chip associate_keyframe uses -- the decision math
        # cannot drift between the two paths
        ins_of_mask, n_new, dropped, unassigned_cnt = mask_decisions(
            votes_full, mask_valid, next_id, track_th, M, Kcap)

        # local relabel of this shard's points
        new_obj = apply_mask_decisions(obj_ids, seg, ins_of_mask)
        return new_obj, ins_of_mask, n_new, dropped, unassigned_cnt, n_matched

    spec_pt = P(axis)
    rep = P()
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec_pt, spec_pt, spec_pt, rep, rep, rep, rep, rep, rep),
        out_specs=(spec_pt, rep, rep, rep, rep, rep),
    )(points, obj_ids, valid, seg_map, mask_valid, depth, c2w, K, next_id)


def sharded_associate_keyframe(mesh: Mesh, map_state, store, seg_map: Array,
                               binary_maps: Array, mask_valid: Array,
                               depth: Array, c2w: Array, K: Array,
                               kf_id: Array, *, axis: str = "dp",
                               match_distance_th: float = 0.05,
                               track_th: int = 100,
                               use_depth_filter: bool = True,
                               unbounded_top_k: bool = True,
                               rgb_depth_ratio=None):
    """Drop-in point-sharded equivalent of association.associate_keyframe
    (same inputs, same (map_state, store,
    KeyframeMatch) outputs, bit-identical results): the point-sized half
    runs under shard_map with ONE psum'd vote matrix, the mask-sized tail
    (mint/fuse/areas/top-k) runs replicated through the SAME
    mask_level_tail the single-chip program uses.

    The map buffers stay sharded over ``axis`` across calls (shard_map
    reshards on entry if needed; steady-state keyframes pay no resharding).
    Unlike the single-chip program this wrapper does NOT donate
    ``map_state`` (only obj_ids is rewritten); ``store`` IS donated into
    the tail program -- treat both as consumed for a uniform contract.
    """
    from ..mapping.association import mask_tail_program

    M = binary_maps.shape[0]
    depth_m = _filtered_depth(depth) if use_depth_filter else depth
    new_obj, ins_of_mask, n_new, dropped, unassigned_cnt, n_matched = \
        sharded_associate_step(
            mesh, map_state.points, map_state.obj_ids,
            map_state.valid_mask(), seg_map, mask_valid, depth_m, c2w, K,
            store.next_id, axis=axis, match_distance_th=match_distance_th,
            track_th=track_th, n_masks=M, n_instances=store.capacity,
            rgb_depth_ratio=rgb_depth_ratio)
    map_state = map_state._replace(obj_ids=new_obj)
    store, match = mask_tail_program(
        store, ins_of_mask, n_new, dropped, unassigned_cnt, seg_map,
        binary_maps, kf_id, n_matched, unbounded_top_k=unbounded_top_k)
    return map_state, store, match


@jax.jit
def _filtered_depth(depth: Array) -> Array:
    from .. import geometry as _geo
    return _geo.depth_filter(depth)


def sharded_similarity(mesh: Mesh, sim_fn, txt_embeds: Array,
                       ins_descs: Array, axis: str = "dp") -> Array:
    """Instance-axis-sharded text-query similarity: each shard computes its
    instances' (n_local, Q) block with the embedder's OWN similarity math
    (``sim_fn(txt, descs)`` -- cosine or siglip logit); the output stays
    instance-sharded and XLA inserts ONE all-gather over ICI when a
    replicated consumer (argmax / host fetch) reads it. N is padded to the
    mesh size; the row-wise math makes the result bit-identical to the
    replicated call."""
    n, d = ins_descs.shape
    n_dev = mesh.shape[axis]
    pad = (-n) % n_dev
    if pad:
        ins_descs = jnp.concatenate(
            [ins_descs, jnp.zeros((pad, d), ins_descs.dtype)])

    def local(txt, descs):
        return sim_fn(txt, descs)  # (n_local, Q), row-wise

    out = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis)))(
            txt_embeds, ins_descs)
    return out[:n]


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
