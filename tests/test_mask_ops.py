"""Mask NMS / seg-map rasterization vs sequential oracles."""
import numpy as np
import jax.numpy as jnp
import torch

from ovo_tpu.ops.masks import compact_masks, mask_nms, masks_to_seg_map


def oracle_mask_nms(masks, scores, iou_thr=0.7, score_thr=0.1, inner_thr=0.2):
    """Sequential re-expression of segment_utils.mask_nms:195-259."""
    scores_t = torch.from_numpy(scores)
    s_sorted, idx = scores_t.sort(0, descending=True)
    idx = idx.numpy()
    n = len(idx)
    m = masks[idx].reshape(n, -1).astype(np.float64)
    area = m.sum(1)
    iou = np.zeros((n, n))
    inner = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            inter = float(np.logical_and(m[i], m[j]).sum())
            union = float(np.logical_or(m[i], m[j]).sum())
            iou[i, j] = inter / union if union else 0.0
            if area[i] and area[j]:
                if inter / area[i] < 0.5 and inter / area[j] >= 0.85:
                    inner[i, j] = 1 - (inter / area[j]) * (inter / area[i])
                if inter / area[i] >= 0.85 and inter / area[j] < 0.5:
                    inner[j, i] = 1 - (inter / area[j]) * (inter / area[i])
    iou_u = np.triu(iou, k=1)
    keep = iou_u.max(0) <= iou_thr
    keep_conf = s_sorted.numpy() > score_thr
    inner_u = np.triu(inner, k=1).max(0)
    inner_l = np.tril(inner, k=1).max(0)
    keep_iu = inner_u <= 1 - inner_thr
    keep_il = inner_l <= 1 - inner_thr
    for arr in (keep_conf, keep_iu, keep_il):
        if arr.sum() == 0:
            arr[np.argsort(-s_sorted.numpy())[:3]] = True
    keep = keep & keep_conf & keep_iu & keep_il
    return set(idx[keep].tolist())


def random_masks(rng, n, h=24, w=32):
    masks = np.zeros((n, h, w), bool)
    for i in range(n):
        y0, x0 = rng.integers(0, h - 6), rng.integers(0, w - 6)
        dy, dx = rng.integers(4, h - y0), rng.integers(4, w - x0)
        masks[i, y0:y0 + dy, x0:x0 + dx] = True
    return masks


def test_mask_nms_matches_oracle(rng):
    for trial in range(5):
        n = 12
        masks = random_masks(rng, n)
        scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
        keep = np.asarray(mask_nms(jnp.asarray(masks), jnp.asarray(scores),
                                   jnp.ones(n, bool)))
        got = set(np.where(keep)[0].tolist())
        want = oracle_mask_nms(masks, scores)
        assert got == want, f"trial {trial}: {got} vs {want}"


def test_mask_nms_duplicates_suppressed(rng):
    base = random_masks(rng, 1)[0]
    masks = np.stack([base, base, base])
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = np.asarray(mask_nms(jnp.asarray(masks), jnp.asarray(scores),
                               jnp.ones(3, bool)))
    assert keep.tolist() == [True, False, False]


def test_mask_nms_padding_ignored(rng):
    n = 6
    masks = random_masks(rng, n)
    scores = rng.uniform(0.2, 1.0, n).astype(np.float32)
    pad_masks = np.concatenate([masks, np.ones((4, *masks.shape[1:]), bool)])
    pad_scores = np.concatenate([scores, np.full(4, 5.0, np.float32)])
    valid = np.array([True] * n + [False] * 4)
    keep = np.asarray(mask_nms(jnp.asarray(pad_masks), jnp.asarray(pad_scores),
                               jnp.asarray(valid)))
    want = oracle_mask_nms(masks, scores)
    assert set(np.where(keep)[0].tolist()) == want
    assert not keep[n:].any()


def oracle_seg_map(masks, stability):
    """mask2segmap oracle: stability-sorted, earlier mask wins overlaps."""
    order = np.argsort(-stability, kind="stable")
    seg = -np.ones(masks.shape[1:], np.int32)
    for rank, oi in enumerate(order):
        m = masks[oi] & (seg == -1)
        seg[m] = oi
    return seg


def test_seg_map_matches_oracle(rng):
    n = 8
    masks = random_masks(rng, n)
    stab = rng.uniform(0.5, 1.0, n).astype(np.float32)
    got = np.asarray(masks_to_seg_map(jnp.asarray(masks), jnp.asarray(stab),
                                      jnp.ones(n, bool)))
    np.testing.assert_array_equal(got, oracle_seg_map(masks, stab))


def test_seg_map_overlap_goes_to_higher_stability(rng):
    h = w = 16
    masks = np.zeros((2, h, w), bool)
    masks[0, :, :10] = True
    masks[1, :, 6:] = True
    stab = np.array([0.6, 0.9], np.float32)
    seg = np.asarray(masks_to_seg_map(jnp.asarray(masks), jnp.asarray(stab),
                                      jnp.ones(2, bool)))
    assert (seg[:, 6:10] == 1).all()  # overlap owned by mask 1 (higher stab)
    assert (seg[:, :6] == 0).all()


def test_compact_masks(rng):
    n = 6
    masks = random_masks(rng, n)
    scores = rng.uniform(size=n).astype(np.float32)
    stab = rng.uniform(size=n).astype(np.float32)
    keep = np.array([False, True, False, True, True, False])
    m2, s2, st2, v2 = compact_masks(jnp.asarray(keep), jnp.asarray(masks),
                                    jnp.asarray(scores), jnp.asarray(stab))
    assert np.asarray(v2).tolist() == [True] * 3 + [False] * 3
    np.testing.assert_array_equal(np.asarray(m2[:3]), masks[[1, 3, 4]])
    np.testing.assert_allclose(np.asarray(s2[:3]), scores[[1, 3, 4]])


class TestMatmulResize:
    """ops/resize.py: separable matmul interpolation must match
    jax.image.resize for upscale and torch F.interpolate for downscale/
    bicubic (the reference's conventions)."""

    def test_linear_upscale_matches_jax(self, rng):
        import jax
        import jax.numpy as jnp

        from ovo_tpu.ops.resize import resize_channels_last, resize_planes

        x = jnp.asarray(rng.standard_normal((14, 18, 5)).astype(np.float32))
        a = jax.image.resize(x, (37, 45, 5), "bilinear")
        b = resize_channels_last(x, (37, 45))
        assert float(jnp.abs(a - b).max()) < 1e-4
        y = jnp.asarray(rng.standard_normal((3, 16, 20)).astype(np.float32))
        a = jax.image.resize(y, (3, 33, 50), "bilinear")
        b = resize_planes(y, (33, 50))
        assert float(jnp.abs(a - b).max()) < 1e-4

    def test_downscale_matches_torch_interpolate(self, rng):
        import jax.numpy as jnp
        import torch
        import torch.nn.functional as F

        from ovo_tpu.ops.resize import resize_planes

        y = rng.standard_normal((3, 64, 96)).astype(np.float32)
        t = F.interpolate(torch.from_numpy(y)[None], size=(20, 30),
                          mode="bilinear", align_corners=False,
                          antialias=False)[0].numpy()
        j = np.asarray(resize_planes(jnp.asarray(y), (20, 30)))
        assert np.abs(t - j).max() < 1e-4

    def test_bicubic_matches_torch(self, rng):
        import jax.numpy as jnp
        import torch
        import torch.nn.functional as F

        from ovo_tpu.ops.resize import resize_channels_last

        x = rng.standard_normal((14, 14, 9)).astype(np.float32)
        t = F.interpolate(torch.from_numpy(x).permute(2, 0, 1)[None],
                          size=(37, 45), mode="bicubic",
                          align_corners=False)[0].permute(1, 2, 0).numpy()
        b = np.asarray(resize_channels_last(jnp.asarray(x), (37, 45),
                                            kind="cubic"))
        assert np.abs(t - b).max() < 1e-4

    def test_batched_channels_last(self, rng):
        import jax
        import jax.numpy as jnp

        from ovo_tpu.ops.resize import resize_channels_last

        xb = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
        a = jax.image.resize(xb, (2, 16, 16, 3), "bilinear")
        b = resize_channels_last(xb, (16, 16))
        assert float(jnp.abs(a - b).max()) < 1e-5
