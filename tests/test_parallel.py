"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ovo_tpu.parallel.mesh import make_mesh, shard_vit_params
from ovo_tpu.parallel.shard import apply_mask_decisions, sharded_vote_step


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    return make_mesh((8, 1))


def test_make_mesh_shapes():
    m = make_mesh((4, 2))
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("dp", "tp")


def test_sharded_votes_match_single_chip(mesh8, rng):
    H, W = 32, 48
    N = 1024  # divisible by 8
    M, Kc = 8, 32
    K = np.array([[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5], [0, 0, 1]],
                 dtype=np.float32)
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)
    # unproject random pixels
    uu = rng.integers(1, W - 1, N)
    vv = rng.integers(1, H - 1, N)
    z = depth[vv, uu]
    pts = np.stack([(uu - K[0, 2]) * z / K[0, 0],
                    (vv - K[1, 2]) * z / K[1, 1], z], 1).astype(np.float32)
    obj = rng.integers(-1, 5, N).astype(np.int32)
    valid = np.ones(N, bool)
    seg = rng.integers(-1, M, (H, W)).astype(np.int32)

    total, assigned, votes, seg_pt = sharded_vote_step(
        mesh8, jnp.asarray(pts), jnp.asarray(obj), jnp.asarray(valid),
        jnp.asarray(seg), jnp.asarray(depth), jnp.asarray(c2w),
        jnp.asarray(K), n_masks=M, n_instances=Kc)

    # single-chip oracle of the same math
    from ovo_tpu import geometry as geo

    corners = geo.compute_camera_frustum_corners(
        jnp.asarray(depth), jnp.asarray(c2w), jnp.asarray(K))
    inf = geo.points_in_frustum(jnp.asarray(pts), corners,
                                valid=jnp.asarray(valid))
    matched, uv = geo.match_points_to_depth(
        jnp.asarray(depth), jnp.asarray(np.linalg.inv(c2w)),
        jnp.asarray(pts), jnp.asarray(K), 0.05, valid=inf)
    u = np.clip(np.asarray(uv[:, 0]), 0, W - 1)
    v = np.clip(np.asarray(uv[:, 1]), 0, H - 1)
    m = np.asarray(matched)
    sref = np.where(m, seg[v, u], -1)
    sref = np.where((sref >= 0) & (sref < M), sref, -1)
    total_ref = np.bincount(sref[sref >= 0], minlength=M)
    np.testing.assert_array_equal(np.asarray(total), total_ref)
    ass_ref = np.bincount(sref[(sref >= 0) & (obj >= 0)], minlength=M)
    np.testing.assert_array_equal(np.asarray(assigned), ass_ref)
    votes_np = np.asarray(votes)
    for mm in range(M):
        sel = (sref == mm) & (obj >= 0)
        vref = np.bincount(obj[sel], minlength=Kc)
        np.testing.assert_array_equal(votes_np[mm], vref)
    np.testing.assert_array_equal(np.asarray(seg_pt), sref)


def test_apply_mask_decisions(rng):
    obj = jnp.asarray([-1, 3, -1, -1], jnp.int32)
    seg = jnp.asarray([0, 0, 1, -1], jnp.int32)
    ins = jnp.asarray([7, -1], jnp.int32)
    out = np.asarray(apply_mask_decisions(obj, seg, ins))
    # unassigned in mask0 -> 7; assigned keeps 3; mask1 invalid; unmatched -1
    np.testing.assert_array_equal(out, [7, 3, -1, -1])


def test_shard_vit_params_places_tp(mesh8):
    from ovo_tpu.models.clip import CLIPModel

    mesh = make_mesh((4, 2))
    model = CLIPModel.random_init("tiny-test")
    sharded = shard_vit_params(model.params["visual"], mesh)
    qkv = sharded["blocks"][0]["attn"]["qkv"]["w"]
    spec = qkv.sharding.spec
    assert spec == P(None, "tp")
    out_w = sharded["blocks"][0]["attn"]["out"]["w"]
    assert out_w.sharding.spec == P("tp", None)
    # forward still runs under the mesh (GSPMD inserts collectives)
    from ovo_tpu.models import vit as vit_mod

    imgs = jnp.zeros((4, 64, 64, 3))
    tokens = vit_mod.forward_features(sharded, model.cfg.vision, imgs)
    assert tokens.shape == (4, 17, 64)


def test_sharded_associate_step_matches_single_chip(mesh8, rng):
    """The complete point-sharded association (votes + decisions + minting +
    local relabel) reproduces associate_keyframe's obj_ids write-back and
    per-mask instance decisions exactly."""
    from ovo_tpu.mapping.association import associate_keyframe
    from ovo_tpu.mapping.instances import init_instance_store
    from ovo_tpu.mapping.map_state import init_map_state
    from ovo_tpu.parallel.shard import sharded_associate_step

    H, W = 32, 48
    N = 1024
    M, Kc = 8, 32
    K = np.array([[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5],
                  [0, 0, 1]], dtype=np.float32)
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)
    uu = rng.integers(1, W - 1, N)
    vv = rng.integers(1, H - 1, N)
    z = depth[vv, uu]
    pts = np.stack([(uu - K[0, 2]) * z / K[0, 0],
                    (vv - K[1, 2]) * z / K[1, 1], z], 1).astype(np.float32)
    obj = rng.integers(-1, 5, N).astype(np.int32)
    seg = rng.integers(-1, M, (H, W)).astype(np.int32)
    mask_valid = np.ones(M, bool)
    mask_valid[3] = False
    binary = np.stack([seg == m for m in range(M)])
    track_th = 20

    # single-chip reference (no depth filter; unbounded top-k)
    state = init_map_state(N)._replace(
        points=jnp.asarray(pts), obj_ids=jnp.asarray(obj),
        count=jnp.asarray(N, jnp.int32))
    store = init_instance_store(Kc, 4)
    store = store._replace(next_id=jnp.asarray(5, jnp.int32),
                           active=store.active.at[:5].set(True))
    new_state, new_store, match = associate_keyframe(
        state, store, jnp.asarray(seg), jnp.asarray(binary),
        jnp.asarray(mask_valid), jnp.asarray(depth), jnp.asarray(c2w),
        jnp.asarray(K), jnp.asarray(0, jnp.int32),
        match_distance_th=0.05, track_th=track_th, use_depth_filter=False,
        unbounded_top_k=True)

    # sharded step over the 8-device mesh
    sharding = NamedSharding(mesh8, P("dp"))
    pts_s = jax.device_put(jnp.asarray(pts), sharding)
    obj_s = jax.device_put(jnp.asarray(obj), sharding)
    val_s = jax.device_put(jnp.ones(N, bool), sharding)
    new_obj, ins_of_mask, n_new, _, _, _ = sharded_associate_step(
        mesh8, pts_s, obj_s, val_s, jnp.asarray(seg),
        jnp.asarray(mask_valid), jnp.asarray(depth), jnp.asarray(c2w),
        jnp.asarray(K), jnp.asarray(5, jnp.int32),
        match_distance_th=0.05, track_th=track_th, n_masks=M,
        n_instances=Kc)

    np.testing.assert_array_equal(np.asarray(new_obj),
                                  np.asarray(new_state.obj_ids))
    assert int(n_new) == int(match.n_new)
    # per-mask decisions: match.ins_ids is keep-filtered, but every kept
    # slot must agree, and the unfiltered decision of kept first-slots too
    kept = np.asarray(match.keep)
    np.testing.assert_array_equal(np.asarray(match.ins_ids)[kept],
                                  np.asarray(ins_of_mask)[kept])


def test_sharded_associate_keyframe_full_parity(mesh8, rng):
    """The drop-in sharded wrapper (point-sharded votes + replicated
    mask_level_tail) reproduces associate_keyframe's ENTIRE output: map
    obj_ids, instance store (minting, top-k slots, matched-point counts),
    and the KeyframeMatch (fused maps, areas, keep) bit-for-bit."""
    from ovo_tpu.mapping.association import associate_keyframe
    from ovo_tpu.mapping.instances import init_instance_store
    from ovo_tpu.mapping.map_state import init_map_state
    from ovo_tpu.parallel.shard import sharded_associate_keyframe

    H, W = 32, 48
    N = 1024
    M, Kc = 8, 32
    K = np.array([[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5],
                  [0, 0, 1]], dtype=np.float32)
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)
    uu = rng.integers(1, W - 1, N)
    vv = rng.integers(1, H - 1, N)
    z = depth[vv, uu]
    pts = np.stack([(uu - K[0, 2]) * z / K[0, 0],
                    (vv - K[1, 2]) * z / K[1, 1], z], 1).astype(np.float32)
    obj = rng.integers(-1, 5, N).astype(np.int32)
    seg = rng.integers(-1, M, (H, W)).astype(np.int32)
    mask_valid = np.ones(M, bool)
    mask_valid[3] = False
    binary = np.stack([seg == m for m in range(M)])
    track_th = 20

    def fresh():
        state = init_map_state(N)._replace(
            points=jnp.asarray(pts), obj_ids=jnp.asarray(obj),
            count=jnp.asarray(N, jnp.int32))
        store = init_instance_store(Kc, 4)
        store = store._replace(next_id=jnp.asarray(5, jnp.int32),
                               active=store.active.at[:5].set(True))
        return state, store

    for use_filter in (False, True):
        state, store = fresh()
        ref_state, ref_store, ref_match = associate_keyframe(
            state, store, jnp.asarray(seg), jnp.asarray(binary),
            jnp.asarray(mask_valid), jnp.asarray(depth), jnp.asarray(c2w),
            jnp.asarray(K), jnp.asarray(0, jnp.int32),
            match_distance_th=0.05, track_th=track_th,
            use_depth_filter=use_filter, unbounded_top_k=True)

        state, store = fresh()
        sharding = NamedSharding(mesh8, P("dp"))
        state = state._replace(
            points=jax.device_put(state.points, sharding),
            obj_ids=jax.device_put(state.obj_ids, sharding))
        sh_state, sh_store, sh_match = sharded_associate_keyframe(
            mesh8, state, store, jnp.asarray(seg), jnp.asarray(binary),
            jnp.asarray(mask_valid), jnp.asarray(depth), jnp.asarray(c2w),
            jnp.asarray(K), jnp.asarray(0, jnp.int32),
            match_distance_th=0.05, track_th=track_th,
            use_depth_filter=use_filter, unbounded_top_k=True)

        np.testing.assert_array_equal(np.asarray(sh_state.obj_ids),
                                      np.asarray(ref_state.obj_ids))
        for f in ref_store._fields:
            a, b = getattr(ref_store, f), getattr(sh_store, f)
            if hasattr(a, "shape"):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=f"store.{f}")
        for f in ref_match._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(ref_match, f)),
                np.asarray(getattr(sh_match, f)), err_msg=f"match.{f}")


def test_sharded_similarity_matches(mesh8, rng):
    from ovo_tpu.ops.similarity import clip_cosine_similarity
    from ovo_tpu.parallel.shard import sharded_similarity

    txt = rng.standard_normal((3, 16)).astype(np.float32)
    descs = rng.standard_normal((21, 16)).astype(np.float32)  # pads to 24
    ref = np.asarray(clip_cosine_similarity(jnp.asarray(txt),
                                            jnp.asarray(descs)))
    got = np.asarray(sharded_similarity(
        mesh8, clip_cosine_similarity, jnp.asarray(txt), jnp.asarray(descs)))
    # float matmul reduction order differs per shard shape; the decisions
    # (argmax over Q) are what must agree
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got.argmax(1), ref.argmax(1))


def test_pipeline_point_shard_e2e(tmp_path, rng):
    """BASELINE config 5 wired into the ONLINE pipeline: the full OVOSemMap
    run with semantic.parallel.{point_shard,shard_query} on the 8-device
    mesh produces the SAME instance map, store, and query results as the
    single-chip run."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from synthetic_scene import (CLASSES, SyntheticWallDataset,
                                 class_embeddings, mask_label_fn,
                                 synthetic_mask_fn)
    from ovo_tpu.data.masks import CallableMaskSource, RecordedEmbedder
    from ovo_tpu.mapping.pipeline import OVOSemMap

    def make_config(parallel):
        return {
            "dataset_name": "synthetic",
            "use_wandb": False,
            "debug": False,
            "slam": {"slam_module": "vanilla", "save_estimated_cam": False},
            "mapping": {"map_every": 2, "k_pooling": 1, "downscale_res": 1,
                        "n_points_capacity": 1 << 16,
                        "initial_capacity": 1 << 16},
            "tracking": {"track_every": 1},
            "data": {"scene_name": "wall0"},
            "cam": {},
            "semantic": {
                "segment_every": 2,
                "match_distance_th": 0.05,
                "track_th": 40,
                "depth_filter": False,
                "log": False,
                "kf_queue_delay": 2,
                "capacity": {"n_instances": 64, "n_masks": 16},
                "clip": {"k_top_views": 10000, "fusion": "avg_pooling",
                         "clip_dim": 16},
                "parallel": parallel,
            },
        }

    def run(parallel):
        ds = SyntheticWallDataset(n_frames=10)
        embeds = class_embeddings(16)
        text_embeds = {c: embeds[i] for i, c in enumerate(CLASSES)}
        embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
        mask_source = CallableMaskSource(synthetic_mask_fn, max_masks=16)
        out = tmp_path / ("p" if parallel else "s")
        sem_map = OVOSemMap(make_config(parallel), out,
                            mask_source=mask_source, embedder=embedder,
                            dataset=ds)
        sem_map.run()
        state = sem_map.slam_backbone.get_map()
        n = int(state.count)
        sim = sem_map.ovo.query(CLASSES, templates=["{}"])
        return (np.asarray(state.obj_ids[:n]), np.asarray(state.points[:n]),
                sem_map.ovo.active_ids(),
                np.asarray(sem_map.ovo.store.clip_feature), sim)

    base = run({})
    par = run({"point_shard": True, "shard_query": True})
    np.testing.assert_array_equal(par[0], base[0])      # instance map
    np.testing.assert_array_equal(par[1], base[1])      # geometry untouched
    np.testing.assert_array_equal(par[2], base[2])      # active ids
    np.testing.assert_array_equal(par[3], base[3])      # descriptors
    np.testing.assert_allclose(par[4], base[4], rtol=1e-5, atol=1e-5)


def test_dp_embed_batch_matches_replicated(mesh8, rng):
    """SemanticMapper._dp_embed_batch (batch axis sharded over dp, GSPMD
    partitions the one vmapped embedder program) matches the replicated
    embed_masks_batch, including the padded-batch case (6 kfs on 8 devs)."""
    from ovo_tpu.mapping.semantic import SemanticMapper
    from ovo_tpu.models.clip import CLIPModel
    from ovo_tpu.models.textregion import TextRegionEmbedder

    model = CLIPModel.random_init("tiny-test")
    emb = TextRegionEmbedder(model, resize_method="multi_resolution")
    sem = SemanticMapper(
        {"capacity": {"n_instances": 16, "n_masks": 4},
         "clip": {"k_top_views": 10000, "fusion": "avg_pooling",
                  "clip_dim": 32},
         "log": False, "parallel": {"dp_embed": True}},
        cam_intrinsics=np.eye(3, dtype=np.float32), embedder=emb)
    sem._mesh = mesh8

    B, H, W = 6, 64, 96
    imgs = (rng.random((B, H, W, 3)) * 255).astype(np.uint8)
    masks = np.zeros((B, 4, H, W), bool)
    masks[:, 0, :30, :30] = True
    masks[:, 1, 30:, 40:] = True
    keeps = jnp.ones((B, 4), bool)
    ref = np.asarray(emb.embed_masks_batch(imgs, jnp.asarray(masks), keeps))
    got = np.asarray(sem._dp_embed_batch(imgs, jnp.asarray(masks), keeps))
    assert got.shape == ref.shape == (B, 4, 32)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_sharded_associate_ratio_parity(mesh8, rng):
    """RGB/depth resolution remap (ScanNet 5-tuple) through the sharded
    path matches the single-chip program exactly."""
    from ovo_tpu.mapping.association import associate_keyframe
    from ovo_tpu.mapping.instances import init_instance_store
    from ovo_tpu.mapping.map_state import init_map_state
    from ovo_tpu.parallel.shard import sharded_associate_keyframe

    H, W = 32, 48
    N, M, Kc = 1024, 8, 32
    K = np.array([[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5],
                  [0, 0, 1]], dtype=np.float32)
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)
    uu = rng.integers(1, W - 1, N)
    vv = rng.integers(1, H - 1, N)
    z = depth[vv, uu]
    pts = np.stack([(uu - K[0, 2]) * z / K[0, 0],
                    (vv - K[1, 2]) * z / K[1, 1], z], 1).astype(np.float32)
    # RGB-resolution segmentation at 2x the depth resolution
    seg = rng.integers(-1, M, (2 * H, 2 * W)).astype(np.int32)
    binary = np.stack([seg == m for m in range(M)])
    valid = np.ones(M, bool)
    ratio = (2.0, 2.0, 0)

    def fresh():
        st = init_map_state(N)._replace(
            points=jnp.asarray(pts), obj_ids=jnp.full((N,), -1, jnp.int32),
            count=jnp.asarray(N, jnp.int32))
        return st, init_instance_store(Kc, 4)

    st, store = fresh()
    ref_st, ref_store, ref_m = associate_keyframe(
        st, store, jnp.asarray(seg), jnp.asarray(binary), jnp.asarray(valid),
        jnp.asarray(depth), jnp.asarray(c2w), jnp.asarray(K),
        jnp.asarray(0, jnp.int32), match_distance_th=0.05, track_th=20,
        use_depth_filter=False, unbounded_top_k=True, rgb_depth_ratio=ratio)

    st, store = fresh()
    sh_st, sh_store, sh_m = sharded_associate_keyframe(
        mesh8, st, store, jnp.asarray(seg), jnp.asarray(binary),
        jnp.asarray(valid), jnp.asarray(depth), jnp.asarray(c2w),
        jnp.asarray(K), jnp.asarray(0, jnp.int32), match_distance_th=0.05,
        track_th=20, use_depth_filter=False, unbounded_top_k=True,
        rgb_depth_ratio=ratio)
    np.testing.assert_array_equal(np.asarray(sh_st.obj_ids),
                                  np.asarray(ref_st.obj_ids))
    np.testing.assert_array_equal(np.asarray(sh_m.ins_ids),
                                  np.asarray(ref_m.ins_ids))
    assert int(sh_m.n_new) == int(ref_m.n_new)


def _collective_counts(hlo_text):
    """Count collective ops in optimized HLO (instruction defs only,
    excluding the -done halves of async pairs)."""
    import re

    counts = {}
    for op in ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter"):
        # match the op application (RHS, after the result shape -- which
        # may be a tuple with spaces); async pairs count once via -start,
        # the -done half never matches
        counts[op] = len(re.findall(rf"\s{op}(?:-start)?\(", hlo_text))
    return counts


def test_sharded_associate_exactly_one_collective(mesh8):
    """Structural guarantee for the 'one collective per keyframe' claim
    (shard.py module docstring): the compiled point-sharded association
    program contains exactly ONE all-reduce (XLA fuses the votes psum and
    the n_matched psum into a single tuple all-reduce) and NO other
    collective of any kind. A regression that adds a second collective --
    e.g. an accidental replicated consumer of sharded state -- fails here
    even if numerics still pass."""
    from ovo_tpu.parallel.shard import sharded_associate_step, \
        sharded_vote_step

    H, W, N, M, Kc = 32, 48, 1024, 8, 32
    K = np.array([[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5],
                  [0, 0, 1]], dtype=np.float32)
    args = (mesh8, jnp.zeros((N, 3), jnp.float32), jnp.zeros(N, jnp.int32),
            jnp.ones(N, bool), jnp.zeros((H, W), jnp.int32),
            jnp.ones(M, bool), jnp.ones((H, W), jnp.float32),
            jnp.eye(4, dtype=jnp.float32), jnp.asarray(K),
            jnp.zeros((), jnp.int32))
    txt = sharded_associate_step.lower(
        *args, n_masks=M, n_instances=Kc).compile().as_text()
    counts = _collective_counts(txt)
    assert counts["all-reduce"] == 1, counts
    assert all(v == 0 for k, v in counts.items() if k != "all-reduce"), counts

    # the vote-only step makes the same guarantee
    txt = sharded_vote_step.lower(
        mesh8, *args[1:5], *args[6:9], n_masks=M,
        n_instances=Kc).compile().as_text()
    counts = _collective_counts(txt)
    assert counts["all-reduce"] == 1, counts
    assert all(v == 0 for k, v in counts.items() if k != "all-reduce"), counts


def test_sharded_similarity_collectives(mesh8, rng):
    """The instance-sharded query program itself is collective-FREE (the
    output stays sharded; the documented all-gather belongs to downstream
    replicated consumers, not this program)."""
    from ovo_tpu.parallel.shard import sharded_similarity

    def sim(txt, descs):
        return descs @ txt.T

    txt_e = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    descs = jnp.asarray(rng.normal(size=(40, 16)).astype(np.float32))
    # mirror sharded_similarity's internals to lower the same program
    import jax as _jax
    from jax.sharding import PartitionSpec as _P

    n, d = descs.shape
    pad = (-n) % mesh8.shape["dp"]
    descs_p = jnp.concatenate([descs, jnp.zeros((pad, d), descs.dtype)])
    prog = _jax.jit(_jax.shard_map(sim, mesh=mesh8, in_specs=(_P(), _P("dp")),
                                   out_specs=_P("dp")))
    counts = _collective_counts(prog.lower(txt_e, descs_p).compile().as_text())
    assert all(v == 0 for v in counts.values()), counts
