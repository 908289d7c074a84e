"""Every attention shape the real-size towers dispatch must either fit the
scoped-VMEM budget on its chosen Pallas route or route to XLA.

Round 2's bench crashed on-chip because the winfused dispatch budgeted only
the f32 score tile and blew the 16 MB scoped-VMEM arena at a Hiera window
shape (BENCH_r02.json: "Scoped allocation with size 18.29M ... exceeded
scoped vmem limit"). CPU tests run kernels in interpret mode and can never
catch that, so this test walks the REAL model shapes (hiera_l @ 1024 AMG,
PE-Core-L14-336 TextRegion over a Replica frame, the text tower) through
``select_attention_route`` with ``on_tpu=True`` and recomputes each chosen
route's footprint against the budget. Shape capture is by ``jax.eval_shape``
over the same jitted programs the bench runs -- zero FLOPs, abstract params.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ovo_tpu.ops.attention as att

H, W = 680, 1200  # Replica frame geometry (bench.py)
M_MASKS = 96


@pytest.fixture(scope="module")
def dispatched_shapes():
    """Capture (bh, lq, lk, d, itemsize, causal, has_mask) of every
    dot_product_attention call in the real-size model programs."""
    from ovo_tpu.models.sam.amg import _amg_program
    from ovo_tpu.models.sam.model import SAMModel
    from ovo_tpu.models.textregion import _textregion_program
    from ovo_tpu.models import text as text_mod

    recorded = []
    orig = att.select_attention_route

    def recorder(bh, lq, lk, d, itemsize, **kw):
        recorded.append((bh, lq, lk, d, itemsize,
                         kw.get("causal", False), kw.get("has_mask", False)))
        return orig(bh, lq, lk, d, itemsize, **kw)

    att.select_attention_route = recorder
    try:
        def bf16(tree):
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, tree)

        # abstract params: init traced under eval_shape, no HBM/RAM cost
        from ovo_tpu.models.sam.model import SAMConfig
        sam_cfg = SAMConfig(encoder="hiera_l", image_size=1024)
        sam_abs = jax.eval_shape(
            lambda: bf16(SAMModel.random_init("hiera_l",
                                              image_size=1024).params))
        amg_kwargs = dict(
            pred_iou_thresh=0.0, stability_thresh=0.0, stability_offset=1.0,
            mask_threshold=0.0, box_nms_thresh=0.7, nms_iou_th=0.8,
            nms_score_th=0.0, nms_inner_th=0.5, max_masks=M_MASKS,
            candidates=256, min_area=0, out_hw=(H, W))
        from ovo_tpu.models.sam.amg import grid_points
        points = jnp.asarray(grid_points(16))
        img = jax.ShapeDtypeStruct((H, W, 3), jnp.float32)
        jax.eval_shape(
            lambda p, im, pts: _amg_program(p, sam_cfg, im, pts,
                                            **amg_kwargs),
            sam_abs, img, points)

        from ovo_tpu.models.clip import MODEL_REGISTRY
        from ovo_tpu.models import vit as vit_mod
        clip_cfg = MODEL_REGISTRY["PE-Core-L14-336"]
        key = jax.random.PRNGKey(0)
        clip_abs = jax.eval_shape(
            lambda: bf16({"visual": vit_mod.init_vit(key, clip_cfg.vision),
                          "text": text_mod.init_text(key, clip_cfg.text)}))
        masks = jax.ShapeDtypeStruct((M_MASKS, H, W), jnp.bool_)
        mean = jnp.asarray(clip_cfg.mean, jnp.float32)
        std = jnp.asarray(clip_cfg.std, jnp.float32)
        cs, ps = clip_cfg.vision.image_size, clip_cfg.vision.patch_size
        ch, cw = max(H // cs, 1), max(W // cs, 1)
        jax.eval_shape(
            lambda p, im, ms: _textregion_program(
                p, clip_cfg.vision, im, ms, mean=mean, std=std,
                crop_size=cs, patch_size=ps, crop_num_h=ch, crop_num_w=cw,
                remove_global=True, gp_threshold=0.07, project=True),
            clip_abs, img, masks)

        # text tower (query path): batch of 8 tokenized prompts
        toks = jax.ShapeDtypeStruct((8, clip_cfg.text.context_length),
                                    jnp.int32)
        jax.eval_shape(
            lambda p, t: text_mod.encode_text(p, clip_cfg.text, t),
            clip_abs["text"], toks)
    finally:
        att.select_attention_route = orig

    assert recorded, "no attention calls captured -- tracing broke"
    return recorded


def test_every_dispatched_shape_fits_or_routes_to_xla(dispatched_shapes):
    seen_routes = set()
    for bh, lq, lk, d, itemsize, causal, has_mask in set(dispatched_shapes):
        route = att.select_attention_route(
            bh, lq, lk, d, itemsize, causal=causal, has_mask=has_mask,
            on_tpu=True, no_pallas=False, impl="auto")
        seen_routes.add(route)
        label = f"shape (bh={bh}, lq={lq}, lk={lk}, d={d}, it={itemsize})"
        if route == "winfused":
            lqp, lkp = -(-lq // 8) * 8, -(-lk // 8) * 8
            wb = att.winfused_window_block(lqp, lkp, d, itemsize)
            assert wb is not None, label
            assert att.winfused_vmem_bytes(wb, lqp, lkp, d, itemsize) \
                <= att._VMEM_BUDGET, label
        elif route == "fused":
            assert att.fused_vmem_bytes(
                -(-lq // 8) * 8, -(-lk // 128) * 128, 128, itemsize) \
                <= att._VMEM_BUDGET, label
        elif route == "flash":
            bq = 128 if lq % 256 else 256
            bk = 128 if lk % 256 else 256
            dp = -(-d // 128) * 128
            assert att.flash_vmem_bytes(bq, bk, -(-lk // bk) * bk, dp,
                                        itemsize) <= att._VMEM_BUDGET, label
        else:
            assert route == "xla", label
    # the dispatch is supposed to USE the kernels on the hot towers -- if
    # everything silently routed to XLA the perf work is disconnected
    assert "winfused" in seen_routes or "fused" in seen_routes, seen_routes


def test_round2_oom_shape_now_fits_or_routes_away():
    """The Hiera stage-3 window shape (25 windows x 8 heads, L=196->200,
    d=72, bf16) is the shape family the round-2 dispatch OOMed on. The
    footprint model must now pick a window block whose total stays inside
    the budget."""
    lqp = lkp = 200
    wb = att.winfused_window_block(lqp, lkp, 72, 2)
    assert wb is not None
    fp = att.winfused_vmem_bytes(wb, lqp, lkp, 72, 2)
    assert fp <= att._VMEM_BUDGET, (wb, fp)
    # the round-2 choice (score-tile-only bound -> wb=26) violated it
    assert att.winfused_vmem_bytes(26, lqp, lkp, 72, 2) > att._VMEM_BUDGET


def test_winfused_block_none_routes_to_xla():
    """If no window block fits, the dispatcher must return 'xla' rather
    than crash in the kernel."""
    # lq=lk=512, d=128, f32: per-instance footprint is ~2.6 MB -> wb=8 won't
    # have room after double buffering? compute directly:
    route = att.select_attention_route(4096, 512, 512, 128, 4,
                                       on_tpu=True)
    if att.winfused_window_block(512, 512, 128, 4) is None:
        assert route in ("xla", "fused", "flash")
    else:
        assert route in ("winfused", "fused", "xla", "flash")


def test_dispatcher_executes_every_route_on_cpu(rng):
    """dot_product_attention on CPU always routes to XLA and matches the
    reference regardless of shape."""
    q = jnp.asarray(rng.standard_normal((2, 2, 196, 72)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, 196, 72)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 2, 196, 72)), jnp.float32)
    ref = att.xla_attention(q, k, v)
    got = att.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
