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
    new_obj, ins_of_mask, n_new = sharded_associate_step(
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
