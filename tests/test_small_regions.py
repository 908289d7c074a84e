"""SAM1 postprocess_small_regions equivalent (connected-component hole
filling + island removal at output resolution).

Reference: the official segment_anything ``postprocess_small_regions`` /
``remove_small_regions`` (cv2 8-connectivity), enabled by
min_mask_region_area=100 at /root/reference/ovo/utils/segment_utils.py:286.
The oracle here is an independent pure-Python BFS transcription of the
official algorithm, so the scipy.ndimage implementation is checked against
different machinery, plus hand-constructed hole/satellite cases.
"""
from collections import deque

import numpy as np
import jax.numpy as jnp
import pytest

from ovo_tpu.models.sam.amg import (postprocess_small_regions_host,
                                    remove_small_regions)


# ---------------------------------------------------------------------------
# Oracle: official remove_small_regions, BFS connected components
# ---------------------------------------------------------------------------

def _bfs_label(img: np.ndarray):
    """8-connectivity component labeling, labels 1..n like cv2 (label 0 =
    background of the working image)."""
    h, w = img.shape
    labels = np.zeros((h, w), np.int32)
    n = 0
    for sy in range(h):
        for sx in range(w):
            if not img[sy, sx] or labels[sy, sx]:
                continue
            n += 1
            q = deque([(sy, sx)])
            labels[sy, sx] = n
            while q:
                y, x = q.popleft()
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        yy, xx = y + dy, x + dx
                        if (0 <= yy < h and 0 <= xx < w and img[yy, xx]
                                and not labels[yy, xx]):
                            labels[yy, xx] = n
                            q.append((yy, xx))
    return labels, n


def oracle_remove_small_regions(mask, area_thresh, mode):
    """Direct transcription of segment_anything amg.py semantics."""
    correct_holes = mode == "holes"
    working = np.logical_xor(correct_holes, mask)
    regions, n_labels = _bfs_label(working)
    sizes = [int((regions == i).sum()) for i in range(1, n_labels + 1)]
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n_labels + 1) if i not in fill]
        if not fill:
            fill = [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True


def test_holes_filled_below_threshold():
    m = np.zeros((20, 30), bool)
    m[2:18, 2:28] = True
    m[5:7, 5:7] = False            # 4-px hole < 10 -> filled
    m[10:14, 10:20] = False        # 40-px hole >= 10 -> kept
    out, changed = remove_small_regions(m, 10, "holes")
    assert changed
    assert out[5:7, 5:7].all()
    assert not out[10:14, 10:20].any()
    # unchanged case
    out2, changed2 = remove_small_regions(out, 10, "holes")
    assert not changed2 and (out2 == out).all()


def test_islands_removed_below_threshold():
    m = np.zeros((20, 30), bool)
    m[2:12, 2:12] = True           # 100-px main region
    m[15:17, 20:22] = True         # 4-px satellite < 10 -> dropped
    out, changed = remove_small_regions(m, 10, "islands")
    assert changed
    assert out[2:12, 2:12].all()
    assert not out[15:17, 20:22].any()


def test_islands_all_small_keeps_largest():
    m = np.zeros((10, 10), bool)
    m[0:2, 0:2] = True             # 4 px
    m[6:9, 6:9] = True             # 9 px -- largest
    out, changed = remove_small_regions(m, 100, "islands")
    assert changed
    assert out[6:9, 6:9].all() and not out[0:2, 0:2].any()
    assert out.any()               # a whole mask is never dropped


def test_diagonal_is_8_connected():
    # two pixels touching only diagonally are ONE component (cv2 default 8)
    m = np.zeros((6, 6), bool)
    m[1, 1] = m[2, 2] = True
    out, changed = remove_small_regions(m, 2, "islands")
    assert not changed             # the 2-px component is >= 2


@pytest.mark.parametrize("mode", ["holes", "islands"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_bfs_oracle(mode, seed):
    rng = np.random.default_rng(seed)
    m = rng.random((24, 32)) > 0.6
    for th in (3, 8, 20):
        got, gch = remove_small_regions(m, th, mode)
        exp, ech = oracle_remove_small_regions(m, th, mode)
        assert gch == ech
        np.testing.assert_array_equal(got, exp)


# ---------------------------------------------------------------------------
# postprocess_small_regions: per-mask fix + dedup NMS
# ---------------------------------------------------------------------------

def test_postprocess_fixes_and_dedups():
    H, W = 24, 32
    bmaps = np.zeros((4, H, W), bool)
    bmaps[0, 4:20, 4:28] = True            # clean big mask (unchanged)
    bmaps[1] = bmaps[0]
    bmaps[1, 10, 10] = False               # 1-px hole -> filled -> dup of 0
    bmaps[2, 4:12, 4:12] = True
    bmaps[2, 20:22, 28:30] = True          # satellite -> removed
    # slot 3 invalid
    valid = np.array([True, True, True, False])
    out, va, changed = postprocess_small_regions_host(bmaps, valid, 10, 0.7)
    assert changed
    # mask 1 became identical to mask 0 after hole fill; the NMS keeps the
    # UNCHANGED duplicate (official: changed masks score 0)
    assert va[0] and not va[1]
    assert not out[1].any()
    # mask 2 kept, satellite dropped, main region intact
    assert va[2]
    assert out[2, 4:12, 4:12].all() and not out[2, 20:22, 28:30].any()
    # hole in mask 0 untouched (it had none) and invalid slot stays invalid
    np.testing.assert_array_equal(out[0], bmaps[0])
    assert not va[3]


def test_postprocess_noop_when_clean():
    bmaps = np.zeros((2, 16, 16), bool)
    bmaps[0, 2:14, 2:14] = True
    valid = np.array([True, False])
    out, va, changed = postprocess_small_regions_host(bmaps, valid, 10, 0.7)
    assert not changed
    np.testing.assert_array_equal(out, bmaps)
    np.testing.assert_array_equal(va, valid)


# ---------------------------------------------------------------------------
# Integration: the SAM1 AMG path runs the post-pass and re-rasterizes
# ---------------------------------------------------------------------------

def test_amg_connected_mode_end_to_end():
    from ovo_tpu.models.sam.amg import AutomaticMaskSource
    from ovo_tpu.models.sam.model import SAMModel

    model = SAMModel.random_init("vit_test", image_size=128)
    src = AutomaticMaskSource(model, points_per_side=2, max_masks=8,
                              candidates=12, pred_iou_thresh=0.0,
                              stability_thresh=0.0, nms_score_th=0.0,
                              min_area=50, min_area_mode="connected")
    img = (np.random.default_rng(0).random((96, 128, 3)) * 255
           ).astype(np.uint8)
    seg, bmaps, valid = src.get_masks(img)
    seg = np.asarray(seg)
    bmaps = np.asarray(bmaps)
    valid = np.asarray(valid)
    # seg map is consistent with the (possibly fixed) masks
    for i in range(bmaps.shape[0]):
        if (seg == i).any():
            assert valid[i]
            assert bmaps[i][seg == i].all()
    # every valid mask has no region smaller than min_area
    for i in np.nonzero(valid)[0]:
        _, ch = remove_small_regions(bmaps[i], 50, "islands")
        assert not ch, f"mask {i} still has a small island"
        _, ch = remove_small_regions(bmaps[i], 50, "holes")
        assert not ch, f"mask {i} still has a small hole"


def test_amg_fast_mode_keeps_in_program_gate():
    from ovo_tpu.models.sam.amg import AutomaticMaskSource
    from ovo_tpu.models.sam.model import SAMModel

    model = SAMModel.random_init("vit_test", image_size=128)
    src = AutomaticMaskSource(model, points_per_side=2, max_masks=8,
                              candidates=12, pred_iou_thresh=0.0,
                              stability_thresh=0.0, nms_score_th=0.0,
                              min_area=50, min_area_mode="fast")
    kwargs = src._amg_kwargs((96, 128))
    assert kwargs["min_area"] == 50      # in-program gate active
    src2 = AutomaticMaskSource(model, points_per_side=2, min_area=50,
                               min_area_mode="connected")
    assert src2._amg_kwargs((96, 128))["min_area"] == 0
