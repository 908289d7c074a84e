"""Live-viewer stream + cross-process query handshake tests
(reference: ovomapping.py:128-135,190-207 <-> visualizer.py:146-162,324-393)
and the TUM_RGBD dataset's timestamp association."""
import time

import numpy as np
import pytest

from ovo_tpu.data.masks import CallableMaskSource, RecordedEmbedder
from ovo_tpu.mapping.pipeline import OVOSemMap

from synthetic_scene import (CLASSES, SyntheticWallDataset, class_embeddings,
                             mask_label_fn, synthetic_mask_fn)


def make_pipeline(tmp_path, stream=False):
    config = {
        "dataset_name": "synthetic", "use_wandb": False, "debug": False,
        "slam": {"slam_module": "vanilla", "save_estimated_cam": False},
        "mapping": {"map_every": 2, "k_pooling": 1, "downscale_res": 1,
                    "n_points_capacity": 1 << 16},
        "tracking": {"track_every": 1},
        "vis": {"stream": stream},
        "data": {"scene_name": "wall0"},
        "cam": {"fx": 80.0, "fy": 80.0, "cx": 47.5, "cy": 31.5,
                "H": 64, "W": 96},
        "semantic": {
            "segment_every": 2, "match_distance_th": 0.05, "track_th": 40,
            "depth_filter": False, "log": False, "kf_queue_delay": 1,
            "capacity": {"n_instances": 64, "n_masks": 16},
            "clip": {"k_top_views": 10000, "fusion": "avg_pooling",
                     "clip_dim": 16},
        },
    }
    ds = SyntheticWallDataset(n_frames=10)
    embeds = class_embeddings(16)
    text_embeds = {c: embeds[i] for i, c in enumerate(CLASSES)}
    embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
    mask_source = CallableMaskSource(synthetic_mask_fn, max_masks=16)
    return OVOSemMap(config, tmp_path, mask_source=mask_source,
                     embedder=embedder, dataset=ds)


def test_query_handshake_mapper_side(tmp_path):
    """Drive the mapper side of the protocol directly (no viewer process):
    flag=1 + query on the pipe -> per-point similarity reply + flag=2."""
    sem_map = make_pipeline(tmp_path)
    queue, viewer_conn, flag = sem_map.enable_stream(spawn_process=False)
    sem_map.run()

    # the run streamed frames into the queue. mp.Queue puts go through a
    # feeder thread, so empty() may be True before items flush under load;
    # drain with a deadline instead.
    import queue as queue_mod
    import time as time_mod
    frames = []
    deadline = time_mod.time() + 30.0
    while time_mod.time() < deadline:
        try:
            item = queue.get(timeout=0.5)
        except queue_mod.Empty:
            if len(frames) >= 3:
                break
            continue
        if item is not None:
            frames.append(item)
    assert len(frames) >= 3
    pts, obj_ids, colors, c2w = frames[-1]
    assert c2w is not None and np.asarray(c2w).shape == (4, 4)
    assert pts.shape[0] == obj_ids.shape[0] == colors.shape[0] > 100

    # now issue a query exactly like the viewer does
    viewer_conn.send("chair")
    with flag.get_lock():
        flag.value = 1
    sem_map._serve_stream_query(timeout=5.0)
    with flag.get_lock():
        assert flag.value == 2
    vals = viewer_conn.recv()
    assert vals.shape[0] == int(sem_map.slam_backbone.get_map().count)
    # chair-labelled points must score ~1 (one-hot embeds), others lower
    assert vals.max() > 0.9


def test_stream_viewer_process_roundtrip(tmp_path):
    """Full two-process protocol: spawned headless viewer consumes frames,
    issues scripted queries, and exports final snapshots."""
    sem_map = make_pipeline(tmp_path)
    sem_map.enable_stream(spawn_process=True, queries=["chair", "table"])
    sem_map.run()

    out = tmp_path / "stream_out"
    assert (out / "stream_final_instances.ply").exists()
    assert (out / "stream_query_chair_query.ply").exists()
    assert (out / "stream_query_table_query.ply").exists()
    # the streamed camera pose produces the frustum lineset export
    # (reference visualizer.py camera frustum; GUI draws it live, headless
    # exports the final one)
    assert (out / "stream_frustum.ply").exists()


def test_camera_frustum_lineset_geometry():
    """Frustum wireframe: apex at the camera center, corners at the
    image-plane rays, rigid under pose transforms."""
    from ovo_tpu.viz.visualizer import camera_frustum_lineset

    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    c2w = np.eye(4)
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    pts, lines = camera_frustum_lineset(c2w, K, (48, 64), depth=0.5)
    assert pts.shape == (5, 3) and lines.shape == (8, 2)
    np.testing.assert_allclose(pts[0], [1.0, 2.0, 3.0])   # optical center
    # corner 1 = pixel (0,0): x = (0-32)*0.5/100
    np.testing.assert_allclose(pts[1], [1 - 0.16, 2 - 0.12, 3.5], atol=1e-9)
    np.testing.assert_allclose(pts[3], [1 + 0.16, 2 + 0.12, 3.5], atol=1e-9)


def test_tum_rgbd_association(tmp_path):
    """TUM timestamp association: rgb/depth/pose lists with jittered stamps
    resolve to consistent triplets; far-off stamps are dropped."""
    import cv2

    from ovo_tpu.data.datasets import TUM_RGBD

    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines, depth_lines, pose_lines = [], [], []
    rng = np.random.default_rng(0)
    for i in range(6):
        t = 100.0 + i * 0.1
        img = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / "rgb" / f"{i}.png"), img)
        d16 = np.full((32, 40), 5000, np.uint16)
        cv2.imwrite(str(tmp_path / "depth" / f"{i}.png"), d16)
        rgb_lines.append(f"{t:.4f} rgb/{i}.png")
        depth_lines.append(f"{t + 0.01:.4f} depth/{i}.png")
        pose_lines.append(f"{t - 0.01:.4f} {0.1 * i} 0 0 0 0 0 1")
    # an rgb frame with no depth/pose nearby -> must be dropped
    rgb_lines.append("999.0 rgb/0.png")
    for name, lines in (("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", pose_lines)):
        with open(tmp_path / name, "w") as f:
            f.write("# comment\n# comment\n# comment\n")
            f.write("\n".join(lines) + "\n")

    ds = TUM_RGBD({"input_path": str(tmp_path), "H": 32, "W": 40,
                   "fx": 30.0, "fy": 30.0, "cx": 19.5, "cy": 15.5,
                   "depth_scale": 5000.0, "frame_rate": -1})
    assert len(ds) == 6
    fid, color, depth, pose = ds[2]
    assert color.shape == (32, 40, 3)
    assert abs(depth.mean() - 1.0) < 1e-3
    assert abs(pose[0, 3] - 0.2) < 1e-6


def test_tracker_adaptive_budget_doubles():
    """adaptive_loss_th > 0 doubles the while_loop budget on a high initial
    loss (tracker.py:153-172)."""
    import jax.numpy as jnp

    from ovo_tpu.slam.gaussian.model import add_points, init_gaussian_state
    from ovo_tpu.slam.gaussian.tracker import track_pose

    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, 128), rng.uniform(-0.8, 0.8, 128),
                    2.0 + 0.2 * rng.random(128)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (128, 3)).astype(np.float32)
    state = init_gaussian_state(256)
    state = add_points(state, jnp.asarray(pts), jnp.asarray(cols),
                       jnp.ones(128, bool))
    state = state._replace(opacity_logit=jnp.full((256,), 2.0))
    K = jnp.asarray(np.array([[40.0, 0, 23.5], [0, 40.0, 15.5], [0, 0, 1]],
                             np.float32))
    from ovo_tpu.ops.splat import render_gaussians

    out = render_gaussians(state.xyz, state.scales(), state.quats,
                           state.opacity(), state.colors(), state.valid,
                           jnp.eye(4), K, img_hw=(32, 48), k_per_tile=16)
    img = out.color
    dep = jnp.asarray(np.asarray(out.depth))
    w2c = np.eye(4, dtype=np.float32)
    w2c[0, 3] += 0.1
    # threshold far above any achievable loss -> plain budget; tiny
    # threshold -> doubled budget should reach a lower loss
    r1 = track_pose(state, img, dep, jnp.asarray(w2c), K, img_hw=(32, 48),
                    iters=10, adaptive_loss_th=1e9, k_per_tile=16)
    r2 = track_pose(state, img, dep, jnp.asarray(w2c), K, img_hw=(32, 48),
                    iters=10, adaptive_loss_th=1e-6, k_per_tile=16)
    assert float(r2.loss) <= float(r1.loss) + 1e-9
    assert float(r2.loss) < float(r2.init_loss)


def test_mask_precompute_hook(tmp_path):
    """Precompute path (ovomapping.py:62-63): first pipeline precomputes npy
    masks with the live source; a second pipeline runs SAM-free from disk
    and reproduces the same instances."""
    import copy

    base_cfg = {
        "dataset_name": "synthetic", "use_wandb": False, "debug": False,
        "slam": {"slam_module": "vanilla", "save_estimated_cam": False},
        "mapping": {"map_every": 2, "k_pooling": 1, "downscale_res": 1,
                    "n_points_capacity": 1 << 16},
        "tracking": {"track_every": 1},
        "data": {"scene_name": "wall0"},
        "cam": {"fx": 80.0, "fy": 80.0, "cx": 47.5, "cy": 31.5,
                "H": 64, "W": 96},
        "semantic": {
            "segment_every": 2, "match_distance_th": 0.05, "track_th": 40,
            "depth_filter": False, "log": False, "kf_queue_delay": 1,
            "capacity": {"n_instances": 64, "n_masks": 16},
            "sam": {"precompute": True,
                    "masks_base_path": str(tmp_path / "masks")},
            "clip": {"k_top_views": 10000, "fusion": "avg_pooling",
                     "clip_dim": 16},
        },
    }
    ds = SyntheticWallDataset(n_frames=8)
    embeds = class_embeddings(16)
    text_embeds = {c: embeds[i] for i, c in enumerate(CLASSES)}

    def build(cfg, out):
        embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
        mask_source = CallableMaskSource(synthetic_mask_fn, max_masks=16)
        return OVOSemMap(cfg, out, mask_source=mask_source,
                         embedder=embedder, dataset=ds)

    m1 = build(copy.deepcopy(base_cfg), tmp_path / "run1")
    import glob
    saved = glob.glob(str(tmp_path / "masks" / "wall0" / "*_seg_map_*.npy"))
    assert len(saved) == 4  # frames 0,2,4,6
    m1.run()

    # second run: SAM-free, loading the saved masks through the factory path
    cfg2 = copy.deepcopy(base_cfg)
    cfg2["semantic"]["sam"] = {"precomputed": True,
                               "masks_base_path": str(tmp_path / "masks")}
    from ovo_tpu.factory import build_mask_source
    ms2 = build_mask_source(cfg2["semantic"], "wall0")
    embedder2 = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
    m2 = OVOSemMap(cfg2, tmp_path / "run2", mask_source=ms2,
                   embedder=embedder2, dataset=ds)
    m2.run()
    np.testing.assert_array_equal(m1.ovo.active_ids(), m2.ovo.active_ids())
