"""End-to-end pipeline test on the synthetic wall scene: run -> checkpoint ->
restore -> classify -> GT label transfer -> confusion metrics. This is the
minimum end-to-end slice (BASELINE config 1): every data structure exercised
with no model weights."""
import numpy as np
import pytest

from ovo_tpu.data.masks import CallableMaskSource, RecordedEmbedder
from ovo_tpu.eval.semantics import update_confmat, iou_acc_from_confmat
from ovo_tpu.eval.transfer import match_labels_to_vtx
from ovo_tpu.mapping.pipeline import OVOSemMap
from ovo_tpu.utils import io as io_utils

from synthetic_scene import (CLASSES, SyntheticWallDataset, class_embeddings,
                             gt_mesh, mask_label_fn, synthetic_mask_fn)


def make_config():
    return {
        "dataset_name": "synthetic",
        "use_wandb": False,
        "debug": False,
        "slam": {"slam_module": "vanilla", "save_estimated_cam": True},
        "mapping": {"map_every": 2, "k_pooling": 1, "downscale_res": 1,
                    "n_points_capacity": 1 << 17},
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
        },
    }


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("run")
    ds = SyntheticWallDataset(n_frames=12)
    embeds = class_embeddings(16)
    text_embeds = {f"This is a photo of a {c}": embeds[i]
                   for i, c in enumerate(CLASSES)}
    text_embeds.update({c: embeds[i] for i, c in enumerate(CLASSES)})
    embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
    mask_source = CallableMaskSource(synthetic_mask_fn, max_masks=16)
    sem_map = OVOSemMap(make_config(), out, mask_source=mask_source,
                        embedder=embedder, dataset=ds)
    sem_map.run()
    return sem_map, out, ds


def test_pipeline_builds_map_and_instances(pipeline_run):
    sem_map, out, ds = pipeline_run
    state = sem_map.slam_backbone.get_map()
    assert int(state.count) > 1000
    ids = sem_map.ovo.active_ids()
    # at least the 4 classes produce instances (regions may fragment at
    # frame borders before views overlap enough)
    assert len(ids) >= 4
    assigned = np.asarray(state.obj_ids[:int(state.count)]) >= 0
    assert assigned.mean() > 0.5


def test_pipeline_checkpoint_roundtrip(pipeline_run):
    sem_map, out, ds = pipeline_run
    ckpt = io_utils.load_ckpt(out / "ovo_map.ckpt")
    assert set(ckpt) == {"map_params", "ovo_map_params"}
    assert ckpt["map_params"]["xyz"].shape[0] == int(
        sem_map.slam_backbone.get_map().count)
    ids = ckpt["ovo_map_params"]["ins_3d_ids"]
    assert len(ids) == len(sem_map.ovo.active_ids())
    for i in ids:
        assert f"ins3d_{i}_clip_feature" in ckpt["ovo_map_params"]


def test_pipeline_query_and_classify(pipeline_run):
    sem_map, out, ds = pipeline_run
    sim = sem_map.ovo.query(CLASSES, templates=["{}"])
    assert sim.shape == (len(sem_map.ovo.active_ids()), len(CLASSES))
    info = sem_map.ovo.classify_instances(CLASSES)
    assert (info["conf"] > 0.9).mean() > 0.8  # one-hot embeds -> confident


def test_pipeline_e2e_miou(pipeline_run):
    """Label transfer to the GT wall mesh + confusion metrics: with perfect
    masks and one-hot embeddings, observed-region mIoU must be high."""
    sem_map, out, ds = pipeline_run
    state = sem_map.slam_backbone.get_map()
    n = int(state.count)
    pts = np.asarray(state.points[:n])
    obj = np.asarray(state.obj_ids[:n])

    info = sem_map.ovo.classify_instances(CLASSES)
    vtx, gt_labels = gt_mesh()
    mesh_ins, masks, matched = match_labels_to_vtx(obj, pts, vtx)
    id_to_idx = {int(i): k for k, i in enumerate(info["ids"])}
    pred_cls = info["classes"][
        np.vectorize(lambda v: id_to_idx[int(v)])(mesh_ins)]

    # only evaluate vertices the camera sweep could observe
    seen = (np.abs(vtx[:, 0]) < 1.9) & (np.abs(vtx[:, 1]) < 0.9)
    conf = np.zeros((len(CLASSES), len(CLASSES)), np.ulonglong)
    update_confmat(conf, gt_labels[seen], pred_cls[seen], ignore=[])
    iou, mask_v, _, acc, acc_m = iou_acc_from_confmat(conf, len(CLASSES), [])
    miou = float(np.mean(iou[mask_v]))
    macc = float(np.mean(acc[acc_m]))
    assert miou > 0.8, f"mIoU {miou}: iou={iou}"
    assert macc > 0.85, f"mAcc {macc}"


def test_pipeline_restore_and_requery(pipeline_run, tmp_path):
    sem_map, out, ds = pipeline_run
    # eval-style reload: rebuild a SemanticMapper from the checkpoint alone
    from ovo_tpu.mapping.semantic import SemanticMapper
    from synthetic_scene import class_embeddings, CLASSES
    from ovo_tpu.data.masks import RecordedEmbedder

    ckpt = io_utils.load_ckpt(out / "ovo_map.ckpt")
    embeds = class_embeddings(16)
    text_embeds = {c: embeds[i] for i, c in enumerate(CLASSES)}
    text_embeds.update({f"This is a photo of a {c}": embeds[i]
                        for i, c in enumerate(CLASSES)})
    embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
    ovo2 = SemanticMapper(make_config()["semantic"], eval=True,
                          embedder=embedder)
    ovo2.restore_dict(ckpt["ovo_map_params"])
    np.testing.assert_array_equal(ovo2.active_ids(),
                                  sem_map.ovo.active_ids())
    sim1 = sem_map.ovo.query(CLASSES, ["{}"])
    sim2 = ovo2.query(CLASSES, ["{}"])
    np.testing.assert_allclose(sim1, sim2, atol=1e-5)


def test_pipeline_sam_batch_matches_serial(tmp_path):
    """sam_batch=2 (micro-batched SAM/embedder, sequential association)
    produces the same instance map as the serial pipeline on the synthetic
    scene (masks are map-independent; the map evolves identically here
    because the synthetic masks don't depend on association timing)."""
    results = {}
    for batch in (1, 2):
        out = tmp_path / f"b{batch}"
        ds = SyntheticWallDataset(n_frames=12)
        embeds = class_embeddings(16)
        text_embeds = {c: embeds[i] for i, c in enumerate(CLASSES)}
        embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
        mask_source = CallableMaskSource(synthetic_mask_fn, max_masks=16)
        cfg = make_config()
        cfg["semantic"]["sam"] = {"batch": batch}
        sem_map = OVOSemMap(cfg, out, mask_source=mask_source,
                            embedder=embedder, dataset=ds)
        sem_map.run()
        store = sem_map.ovo.store
        results[batch] = (int(store.next_id),
                          np.asarray(store.desc_cnt).copy(),
                          np.asarray(store.clip_feature).copy(),
                          np.asarray(sem_map.slam_backbone.get_map().count))
    assert results[1][0] == results[2][0]          # same instances minted
    np.testing.assert_array_equal(results[1][3], results[2][3])
    np.testing.assert_array_equal(results[1][1], results[2][1])
    np.testing.assert_allclose(results[1][2], results[2][2], atol=1e-5)


def test_sam_batch_miou_cost_on_noisy_fixture(tmp_path):
    """Quantify the accuracy cost of sam.batch > 1 where it can actually
    show (VERDICT r3): the micro-batch path defers association of buffered
    keyframes by (B-1)*segment_every frames against a correspondingly
    fuller map (semantic.py flush_segmentation). The degraded-mask fixture
    is timing-sensitive (shifted + wrong-label mask bands), so any
    deferral cost lands in the end-to-end mIoU. Asserts the batch-2 delta
    stays under 0.05 mIoU; the measured table lives in PARITY.md section
    'sam.batch accuracy'."""
    from synthetic_scene import noisy_mask_fn

    miou = {}
    for batch in (1, 2, 4):
        out = tmp_path / f"nb{batch}"
        ds = SyntheticWallDataset(n_frames=12)
        embeds = class_embeddings(16)
        text_embeds = {f"This is a photo of a {c}": embeds[i]
                       for i, c in enumerate(CLASSES)}
        text_embeds.update({c: embeds[i] for i, c in enumerate(CLASSES)})
        embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
        mask_source = CallableMaskSource(noisy_mask_fn, max_masks=16)
        cfg = make_config()
        cfg["semantic"]["sam"] = {"batch": batch}
        sem_map = OVOSemMap(cfg, out, mask_source=mask_source,
                            embedder=embedder, dataset=ds)
        sem_map.run()
        miou[batch] = _device_miou(sem_map)
    print(f"[sam-batch] noisy-fixture mIoU: " +
          ", ".join(f"b{b}={m:.4f}" for b, m in miou.items()))
    assert 0.2 < miou[1] < 0.985          # degraded, off the ceiling
    assert abs(miou[2] - miou[1]) < 0.05, miou
    # batch-4 defers by up to 3*segment_every frames; keep it recorded and
    # loosely bounded rather than silently unmeasured
    assert abs(miou[4] - miou[1]) < 0.10, miou


def test_pipeline_orbslam_tier_e2e(tmp_path):
    """Full OVOSemMap loop with slam_module=orbslam: poses come from the
    native dense tracker (NOT GT), mapping only fires on tracker keyframes,
    and the semantic map still forms. Closes the gap where the ORB tier was
    only exercised through direct WrapperORBSLAM calls."""
    cfg = make_config()
    cfg["slam"] = {"slam_module": "orbslam", "save_estimated_cam": True,
                   # every 0.25 m lateral step should spawn a keyframe
                   "kf_trans_th": 0.15, "kf_rot_th": 0.15,
                   "kf_inlier_th": 0.6}
    ds = SyntheticWallDataset(n_frames=12, textured=True)
    embeds = class_embeddings(16)
    text_embeds = {f"This is a photo of a {c}": embeds[i]
                   for i, c in enumerate(CLASSES)}
    text_embeds.update({c: embeds[i] for i, c in enumerate(CLASSES)})
    embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
    mask_source = CallableMaskSource(synthetic_mask_fn, max_masks=16)
    sem_map = OVOSemMap(cfg, tmp_path, mask_source=mask_source,
                        embedder=embedder, dataset=ds)
    sem_map.run()

    # tracker poses close to GT on the textured wall (first pose anchors
    # the world frame, so it is exact)
    errs = []
    for fid, est in sem_map.slam_backbone.estimated_c2ws.items():
        gt = ds.poses[fid]
        errs.append(np.linalg.norm(np.asarray(est)[:3, 3] - gt[:3, 3]))
    assert len(errs) >= len(ds) - 1
    assert max(errs) < 0.08, f"tracker drift too large: {max(errs):.3f}"

    # keyframes spawned and the dense map + instances formed through the
    # tracker-gated mapping cadence
    assert sem_map.slam_backbone.tracker.num_keyframes() >= 3
    assert int(sem_map.slam_backbone.state.count) > 1000
    info = sem_map.ovo.classify_instances(CLASSES)
    assert (info["conf"] > 0.9).sum() >= 2  # one-hot embeds -> confident


def test_pipeline_loop_closure_fires_through_pipeline(tmp_path):
    """A drifted out-and-back run through the FULL OVOSemMap loop: the
    native tracker detects the revisit, bumps big_change, and the
    pipeline's map_updated glue calls SemanticMapper.update_map (dense map
    rebuild + semantic LC) mid-run. Covers pipeline.py's loop-closure
    branch, previously only unit-tested at the wrapper level."""
    cfg = make_config()
    cfg["slam"] = {"slam_module": "orbslam", "save_estimated_cam": True,
                   "kf_trans_th": 0.05, "kf_rot_th": 0.15,
                   "kf_inlier_th": 0.6,
                   "loop_min_kf_gap": 5, "loop_radius": 0.15,
                   "loop_rot_limit": 1.0, "loop_inlier_th": 0.3}
    # noisy out-and-back: odometry drifts on the way out, the return to
    # x~0 revisits the first keyframes
    ds = SyntheticWallDataset(n_frames=40, step=0.05, textured=True,
                              trajectory="loop", noise_sigma=15.0)
    embeds = class_embeddings(16)
    text_embeds = {f"This is a photo of a {c}": embeds[i]
                   for i, c in enumerate(CLASSES)}
    text_embeds.update({c: embeds[i] for i, c in enumerate(CLASSES)})
    embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
    mask_source = CallableMaskSource(synthetic_mask_fn, max_masks=16)
    sem_map = OVOSemMap(cfg, tmp_path, mask_source=mask_source,
                        embedder=embedder, dataset=ds)
    sem_map.run()

    assert sem_map.slam_backbone.last_big_change >= 1, \
        "loop closure never fired through the pipeline"
    # the corrected final pose must be back near the start
    last_fid = max(sem_map.slam_backbone.estimated_c2ws)
    final = np.asarray(sem_map.slam_backbone.estimated_c2ws[last_fid])
    assert abs(final[0, 3] - ds.poses[last_fid][0, 3]) < 0.06
    # map and instances survive the mid-run rebuild
    assert int(sem_map.slam_backbone.state.count) > 500
    info = sem_map.ovo.classify_instances(CLASSES)
    assert (info["conf"] > 0.9).sum() >= 2

    # keyframe culling propagates END-TO-END (VERDICT r2 #5): culled
    # tracker keyframes are gone from the wrapper's kf set, their map
    # blocks were dropped from the dense cloud, and a final semantic LC
    # pass holds descriptors only for surviving dataset frames
    tracker_kfs = sem_map.slam_backbone.tracker.get_keyframes()
    culled_fids = {int(round(f)) for f, _, c in tracker_kfs if c}
    assert culled_fids, "revisit trajectory should cull redundant kfs"
    surviving = set(sem_map.slam_backbone.get_kfs())
    assert not (culled_fids & surviving)
    new_state = sem_map.ovo.update_map(sem_map.slam_backbone.get_map(),
                                       sem_map.slam_backbone.get_kfs())
    assert new_state is not None
    held_fids = {sem_map.ovo.frame_ids[k]
                 for k in sem_map.ovo.kf_descriptors}
    assert held_fids <= surviving, (held_fids - surviving)
    # non-vacuity: at least one segmented keyframe was actually culled
    # somewhere in the run, so drop_keyframes had real work
    assert culled_fids & set(sem_map.ovo.frame_ids), \
        "no segmented keyframe was culled -- assertion above is vacuous"


def test_pipeline_restore_map_resume(tmp_path):
    """Mid-run resume (reference ovomapping.py:68-71,102-116): run half the
    scene, checkpoint, rebuild with restore_map=True, continue — the resumed
    run reaches the same instance ids and map size as an uninterrupted one."""

    class Truncated:
        def __init__(self, ds, n):
            self._ds, self._n = ds, n
            self.__dict__.update({k: v for k, v in ds.__dict__.items()
                                  if k not in ("_ds", "_n")})

        def __len__(self):
            return self._n

        def __getitem__(self, i):
            return self._ds[i]

    def build(out, ds, restore=False):
        embeds = class_embeddings(16)
        text_embeds = {c: embeds[i] for i, c in enumerate(CLASSES)}
        embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
        mask_source = CallableMaskSource(synthetic_mask_fn, max_masks=16)
        cfg = make_config()
        cfg["restore_map"] = restore
        return OVOSemMap(cfg, out, mask_source=mask_source,
                         embedder=embedder, dataset=ds)

    full = SyntheticWallDataset(n_frames=12)

    # uninterrupted reference run
    out_a = tmp_path / "full"
    a = build(out_a, full)
    a.run()

    # half run -> checkpoint -> resume with the full dataset
    out_b = tmp_path / "resumed"
    b1 = build(out_b, Truncated(full, 6))
    b1.run()
    assert (out_b / "ovo_map.ckpt").exists()
    assert (out_b / "estimated_c2w.npy").exists()
    b2 = build(out_b, full, restore=True)
    assert b2.first_frame == 6
    b2.run()

    na, nb = int(a.ovo.store.next_id), int(b2.ovo.store.next_id)
    assert na == nb
    np.testing.assert_array_equal(
        np.asarray(a.ovo.store.active), np.asarray(b2.ovo.store.active))
    assert int(a.slam_backbone.get_map().count) == \
        int(b2.slam_backbone.get_map().count)


def _oracle_pipeline_miou(mask_fn):
    """Fully independent numpy/torch ORACLE pipeline over the fixture
    frames -- sequential vanilla map insert, OracleTracker association
    (torch.mode majority votes), avg descriptor fusion, cosine
    classification, brute-force knn label transfer, independent confusion
    matrix -- returning its end-to-end mIoU."""
    from oracle_reference import OracleTracker, oracle_frustum_mask, \
        oracle_match_points
    from ovo_tpu.data.masks import pad_masks
    from synthetic_scene import CLASSES, SyntheticWallDataset, \
        class_embeddings, mask_label_fn

    embeds = class_embeddings(16)

    # ---- oracle pipeline over the same fixture frames ----
    ds = SyntheticWallDataset(n_frames=12)
    pts = np.zeros((0, 3), np.float32)
    obj = np.zeros((0,), np.int32)
    tracker = OracleTracker(track_th=40, n_top=10000)
    desc_sum = {}
    desc_cnt = {}
    kf_id = 0
    for fid in range(len(ds)):
        frame_id, image, depth, c2w = ds[fid]
        c2w = np.asarray(c2w, np.float64)
        K = np.asarray(ds.K, np.float64)

        if fid % 2 == 0:  # map_every: vanilla insert (k_pooling=1, ds=1)
            mask = depth > 0
            if len(pts):
                frustum = oracle_frustum_mask(depth, c2w, K, pts)
                okm, uc, vc = oracle_match_points(
                    depth, np.linalg.inv(c2w), pts, K, 0.03,
                    frustum=frustum)
                hits = np.zeros(depth.shape, bool)
                hits[vc[okm], uc[okm]] = True
                mask = mask & ~hits
            vv, uu = np.nonzero(mask)
            z = depth[vv, uu]
            x = (uu - K[0, 2]) * z / K[0, 0]
            y = (vv - K[1, 2]) * z / K[1, 1]
            cam = np.stack([x, y, z], 1)
            new = cam @ c2w[:3, :3].T + c2w[:3, 3]
            pts = np.concatenate([pts, new.astype(np.float32)])
            obj = np.concatenate([obj, np.full(len(new), -1, np.int32)])

        if fid % 2 == 0:  # segment_every: associate + record descriptors
            got = mask_fn(image, fid)
            if got is None:
                continue
            seg, bmaps, valid = pad_masks(got[0], got[1], 16)
            frustum = oracle_frustum_mask(depth, c2w, K, pts)
            ok, uc, vc = oracle_match_points(
                depth, np.linalg.inv(c2w), pts, K, 0.05, frustum=frustum)
            matched_idx = np.where(ok)[0]
            mseg = seg[vc[matched_idx], uc[matched_idx]]
            inb = (mseg >= 0) & valid[np.clip(mseg, 0, 15)]
            obj, info = tracker.track(obj, matched_idx[inb], mseg[inb],
                                      seg, kf_id)
            ins_ids, fused, _ = tracker.fuse(bmaps, info, kf_id)
            if len(ins_ids):
                labels = mask_label_fn(image, fused,
                                       np.ones(len(ins_ids), bool))
                for ins, lab in zip(ins_ids, labels):
                    desc_sum[ins] = desc_sum.get(ins, 0.0) + embeds[lab % 16]
                    desc_cnt[ins] = desc_cnt.get(ins, 0) + 1
            kf_id += 1

    # classify: cosine argmax against the class embeddings
    ins_sorted = sorted(desc_sum)
    descs = np.stack([desc_sum[i] / desc_cnt[i] for i in ins_sorted])
    descs = descs / np.maximum(
        np.linalg.norm(descs, axis=-1, keepdims=True), 1e-12)
    txt = embeds / np.maximum(
        np.linalg.norm(embeds, axis=-1, keepdims=True), 1e-12)
    cls_of_ins = {i: int(np.argmax(descs[k] @ txt.T))
                  for k, i in enumerate(ins_sorted)}

    # label transfer: brute-force knn (k=5) mode vote to the GT mesh
    from synthetic_scene import gt_mesh
    vtx, gt_labels = gt_mesh()
    lab_pts = pts[obj >= 0]
    lab_obj = obj[obj >= 0]
    d2 = ((vtx[:, None, :] - lab_pts[None, :500, :]) ** 2).sum(-1)  # probe
    # full brute force in chunks to bound memory
    pred = np.zeros(len(vtx), np.int64)
    for s in range(0, len(vtx), 512):
        d2 = ((vtx[s:s + 512, None, :] - lab_pts[None, :, :]) ** 2).sum(-1)
        nn = np.argpartition(d2, 5, axis=1)[:, :5]
        votes = lab_obj[nn]
        for r in range(votes.shape[0]):
            vals, cnts = np.unique(votes[r], return_counts=True)
            pred[s + r] = vals[np.argmax(cnts)]
    pred_cls = np.array([cls_of_ins.get(int(i), -1) for i in pred])

    seen = (np.abs(vtx[:, 0]) < 1.9) & (np.abs(vtx[:, 1]) < 0.9)
    nC = len(CLASSES)
    conf = np.zeros((nC, nC), np.int64)
    for g, p in zip(gt_labels[seen], pred_cls[seen]):
        if 0 <= p < nC:
            conf[g, p] += 1
    tp = np.diag(conf).astype(np.float64)
    iou = tp / np.maximum(conf.sum(0) + conf.sum(1) - tp, 1)
    return float(iou.mean())


def _device_miou(sem_map):
    """The device pipeline's end-to-end mIoU on the same mesh/eval
    recipe."""
    from synthetic_scene import CLASSES, gt_mesh

    vtx, gt_labels = gt_mesh()
    seen = (np.abs(vtx[:, 0]) < 1.9) & (np.abs(vtx[:, 1]) < 0.9)
    nC = len(CLASSES)
    state = sem_map.slam_backbone.get_map()
    n = int(state.count)
    dpts = np.asarray(state.points[:n])
    dobj = np.asarray(state.obj_ids[:n])
    info = sem_map.ovo.classify_instances(CLASSES)
    mesh_ins, _, _ = match_labels_to_vtx(dobj, dpts, vtx)
    id_to_idx = {int(i): k for k, i in enumerate(info["ids"])}
    dev_cls = info["classes"][
        np.vectorize(lambda v: id_to_idx[int(v)])(mesh_ins)]
    dconf = np.zeros((nC, nC), np.int64)
    for g, p in zip(gt_labels[seen], dev_cls[seen]):
        if 0 <= p < nC:
            dconf[g, p] += 1
    dtp = np.diag(dconf).astype(np.float64)
    diou = dtp / np.maximum(dconf.sum(0) + dconf.sum(1) - dtp, 1)
    return float(diou.mean())


def test_pipeline_e2e_miou_matches_oracle_pipeline(pipeline_run):
    """Recorded-fixture end-to-end parity (VERDICT round-1 #2b): the same
    frames, masks, and recorded descriptors through the device pipeline and
    the independent oracle pipeline must land on the same mIoU."""
    sem_map, out, ds_used = pipeline_run
    oracle_miou = _oracle_pipeline_miou(synthetic_mask_fn)
    device_miou = _device_miou(sem_map)
    print(f"[parity] device mIoU={device_miou:.4f} "
          f"oracle mIoU={oracle_miou:.4f}")
    assert device_miou > 0.9 and oracle_miou > 0.9
    assert abs(device_miou - oracle_miou) < 0.02, \
        (device_miou, oracle_miou)


@pytest.fixture(scope="module")
def noisy_pipeline_run(tmp_path_factory):
    from synthetic_scene import noisy_mask_fn

    out = tmp_path_factory.mktemp("noisy_run")
    ds = SyntheticWallDataset(n_frames=12)
    embeds = class_embeddings(16)
    text_embeds = {f"This is a photo of a {c}": embeds[i]
                   for i, c in enumerate(CLASSES)}
    text_embeds.update({c: embeds[i] for i, c in enumerate(CLASSES)})
    embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
    mask_source = CallableMaskSource(noisy_mask_fn, max_masks=16)
    sem_map = OVOSemMap(make_config(), out, mask_source=mask_source,
                        embedder=embedder, dataset=ds)
    sem_map.run()
    return sem_map


def test_noisy_fixture_miou_matches_oracle(noisy_pipeline_run):
    """Degraded-input parity: DETERMINISTICALLY corrupted masks (shifted +
    wrong-label bands, synthetic_scene.noisy_mask_fn) through both
    pipelines. The end-to-end mIoU must drop clearly below perfect and the
    device pipeline must still agree with the oracle on the degraded value
    -- much stronger evidence than the perfect-mask fixture, where
    disagreements can hide at ceiling."""
    from synthetic_scene import noisy_mask_fn

    oracle_miou = _oracle_pipeline_miou(noisy_mask_fn)
    device_miou = _device_miou(noisy_pipeline_run)
    print(f"[parity-noisy] device mIoU={device_miou:.4f} "
          f"oracle mIoU={oracle_miou:.4f}")
    assert 0.2 < device_miou < 0.985, device_miou
    assert abs(device_miou - oracle_miou) < 0.03, \
        (device_miou, oracle_miou)


def test_pipeline_fused_insert_matches_two_step(tmp_path):
    """The online pipeline's fused associate+insert (one program when the
    vanilla backbone maps on the segment cadence, PERF.md 6n wired online)
    produces EXACTLY the same map and instance state as the two-step
    map() -> associate flow (the program-level equality is pinned in
    tests/test_association.py; this pins the PIPELINE wiring: cadence
    gating, growth bookkeeping, active_rows bound, color pre-subsample)."""
    embeds = class_embeddings(16)
    text_embeds = {c: embeds[i] for i, c in enumerate(CLASSES)}

    def run(fused: bool, out):
        ds = SyntheticWallDataset(n_frames=12)
        embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
        mask_source = CallableMaskSource(synthetic_mask_fn, max_masks=16)
        sem_map = OVOSemMap(make_config(), out, mask_source=mask_source,
                            embedder=embedder, dataset=ds)
        if not fused:
            sem_map.slam_backbone.supports_fused_insert = False
        sem_map.run()
        return sem_map

    a = run(True, tmp_path / "fused")
    b = run(False, tmp_path / "twostep")
    sa, sb = a.slam_backbone.get_map(), b.slam_backbone.get_map()
    na, nb = int(sa.count), int(sb.count)
    assert na == nb
    np.testing.assert_array_equal(np.asarray(sa.points[:na]),
                                  np.asarray(sb.points[:nb]))
    np.testing.assert_array_equal(np.asarray(sa.obj_ids[:na]),
                                  np.asarray(sb.obj_ids[:nb]))
    np.testing.assert_array_equal(np.asarray(sa.colors[:na]),
                                  np.asarray(sb.colors[:nb]))
    np.testing.assert_array_equal(np.asarray(a.ovo.store.active),
                                  np.asarray(b.ovo.store.active))
    np.testing.assert_allclose(np.asarray(a.ovo.store.clip_feature),
                               np.asarray(b.ovo.store.clip_feature),
                               rtol=0, atol=0)
