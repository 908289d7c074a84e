"""Attention / masked-pool kernels vs XLA reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ovo_tpu.ops.attention import flash_attention, xla_attention
from ovo_tpu.ops.masked_pool import (pallas_masked_pool,
                                     xla_masked_single_query_attention)


def test_flash_attention_matches_xla(rng):
    b, h, l, d = 2, 3, 256, 128
    q = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    ref = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_attention_causal(rng):
    b, h, l, d = 1, 2, 256, 128
    q = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
    ref = xla_attention(q, k, v, mask=mask)
    got = flash_attention(q, k, v, causal=True, block_q=128, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("d", [64, 72])
def test_flash_attention_small_head_dim(rng, d):
    """PE ViT (hd=64) and Hiera (hd=72) head dims route through the kernel."""
    b, h, l = 2, 2, 256
    q = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    ref = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_attention_padded_head_dim(rng):
    """The large-sequence auto-dispatch path zero-pads the head dim to the
    MXU-native 128 (dot_product_attention `big` branch): padded q/k leave
    the scores unchanged and padded v columns slice off exactly."""
    b, h, l, d = 1, 2, 256, 72
    q = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    ref = xla_attention(q, k, v)
    pad = [(0, 0)] * 3 + [(0, 128 - d)]
    got = flash_attention(jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
                          scale=d ** -0.5, block_q=128, block_k=128,
                          interpret=True)[..., :d]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_attention_ragged_kv(rng):
    """Padded key rows beyond kv_len must receive zero weight (PE's L=577
    pads to 640)."""
    b, h, lq, lk_valid, d = 1, 2, 128, 193, 64
    lk_pad = 256
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk_valid, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk_valid, d)), jnp.float32)
    ref = xla_attention(q, k, v)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - lk_valid), (0, 0)))
    # poison the padded value rows: they must not leak into the output
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - lk_valid), (0, 0)),
                 constant_values=1e6)
    got = flash_attention(q, kp, vp, block_q=128, block_k=128,
                          kv_len=lk_valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_masked_pool_matches_xla(rng):
    m, h, l, d = 5, 4, 96, 32
    q = jnp.asarray(rng.standard_normal((m, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((h, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((h, l, d)), jnp.float32)
    mask = jnp.asarray(rng.random((m, l)) > 0.4)
    mask = mask.at[:, 0].set(True)  # every mask attends to something
    ref = xla_masked_single_query_attention(q, k, v, mask)
    got = pallas_masked_pool(q, k, v, mask, scale=d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_masked_pool_uniform_when_constant_k(rng):
    """TextRegion quirk: constant k across tokens -> masked MEAN of v."""
    m, h, l, d = 3, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((m, h, d)), jnp.float32)
    k_const = jnp.asarray(rng.standard_normal((h, 1, d)), jnp.float32)
    k = jnp.broadcast_to(k_const, (h, l, d))
    v = jnp.asarray(rng.standard_normal((h, l, d)), jnp.float32)
    mask = jnp.asarray(rng.random((m, l)) > 0.5).at[:, 0].set(True)
    out = xla_masked_single_query_attention(q, k, v, mask)
    for i in range(m):
        mean = np.asarray(v)[:, np.asarray(mask[i]), :].mean(1)
        np.testing.assert_allclose(np.asarray(out[i]), mean, atol=1e-5)


def test_fused_attention_matches_xla(rng):
    from ovo_tpu.ops.attention import fused_attention
    b, h, l, d = 2, 4, 256, 128
    q = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    ref = xla_attention(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_attention_padded_pe_shape(rng):
    """The dispatch path's padding recipe at the PE tower shape: lq padded
    to a multiple of 8, lk to 128 with kv_len masking, head dim zero-padded
    to 128 and sliced back."""
    from ovo_tpu.ops.attention import fused_attention
    b, h, l, d = 2, 3, 577, 64
    q = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    ref = xla_attention(q, k, v)
    lq_pad, lk_pad, d_pad = (-l) % 8, (-l) % 128, (-d) % 128
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad), (0, d_pad)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad), (0, d_pad)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad), (0, d_pad)))
    got = fused_attention(qp, kp, vp, scale=d ** -0.5, kv_len=l,
                          interpret=True)[..., :l, :d]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("b,h,lq,lk,d", [
    (1024, 2, 64, 64, 72),    # Hiera stage-1 windows
    (1024, 2, 16, 64, 72),    # stage-transition block: q pooled 2x2
    (25, 8, 196, 196, 72),    # Hiera stage-3 windows (lq%8 != 0)
    (256, 8, 13, 13, 32),     # decoder token self-attention
])
def test_windowed_fused_attention_matches_xla(rng, b, h, lq, lk, d):
    """The batched multi-window kernel + the dispatch padding recipe
    (lq/lk padded to multiples of 8 with kv_len masking, b*h padded to the
    window block) against plain XLA attention."""
    from ovo_tpu.ops.attention import windowed_fused_attention
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    ref = xla_attention(q, k, v)
    lq_pad, lk_pad = (-lq) % 8, (-lk) % 8
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
    got = windowed_fused_attention(
        qp, kp, vp, scale=d ** -0.5, kv_len=lk if lk_pad else None,
        interpret=True)[..., :lq, :d]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("B,Bimg,T,L,heads,dint", [
    (6, 1, 8, 256, 8, 128),    # decoder layer-0 t2i/i2t: image enters batch-1
    (6, 6, 8, 256, 8, 128),    # later layers: per-prompt image side
    (4, 4, 11, 384, 8, 128),   # T not a multiple of 8 -> pad + t_len mask
])
def test_cross_attention_small_head_matches_xla(rng, B, Bimg, T, L, heads,
                                                dint):
    """The block-diag-packed cross kernels (both directions) against the
    reference per-head XLA path, exercising the exact decoder padding +
    batch-1 image sharing recipe via the interpret-mode pallas calls."""
    from ovo_tpu.ops import attention as att

    tok = jnp.asarray(rng.standard_normal((B, T, dint)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((Bimg, L, dint)), jnp.float32)
    scale = (dint // heads) ** -0.5
    pad_t = (-T) % 8

    # tokens -> image
    ref = att._xla_cross(tok, img, img, heads)
    tok_p = jnp.pad(tok, ((0, 0), (0, pad_t), (0, 0))) if pad_t else tok
    qexp = att._expand_blockdiag(tok_p, heads)
    got = att._crossq_call(qexp, img, img, heads=heads, scale=scale,
                           interpret=True)
    got = att._extract_blockdiag(got, heads, T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)

    # image -> tokens (v enters the kernel block-diag-expanded like k)
    ref = att._xla_cross(img, tok, tok, heads)
    kexp = att._expand_blockdiag(tok_p, heads)
    got = att._crossk_call(img, kexp, kexp, heads=heads, scale=scale,
                           t_len=T, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_cross_attention_small_head_cpu_fallback(rng):
    """On CPU the public wrapper must route to the XLA path and agree with
    the per-head reference for both directions and batch-1 image sides."""
    from ovo_tpu.ops import attention as att

    tok = jnp.asarray(rng.standard_normal((5, 8, 128)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 256, 128)), jnp.float32)
    got = att.cross_attention_small_head(tok, img, img, 8)
    ref = att._xla_cross(tok, img, img, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    got = att.cross_attention_small_head(img, tok, tok, 8)
    ref = att._xla_cross(img, tok, tok, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_cross_vmem_fits_decoder_shape():
    """The production decoder shape (heads*T = 64 rows, L = 4096, D = 128,
    bf16) must fit the scoped-VMEM budget; a wildly long image side must be
    rejected so the wrapper falls back to XLA."""
    from ovo_tpu.ops import attention as att

    assert att._cross_fits(64, 4096, 128, 2)
    assert not att._cross_fits(64, 1 << 20, 128, 2)


@pytest.mark.parametrize("rows,c,dtype", [
    (4039, 1024, jnp.bfloat16),   # PE tower (7, 577, 1024): odd rows -> pad
    (1048576, 256, jnp.bfloat16),  # decoder norm4 (256*4096, 256)
    (2048, 128, jnp.float32),
])
def test_pallas_layer_norm_matches_xla(rng, rows, c, dtype):
    """The single-pass LN kernel (a tested utility, not wired into the
    towers — PERF.md 6q) must match the f32-statistics XLA layer_norm to
    output-dtype rounding."""
    from ovo_tpu.ops import layer_norm as pln

    if rows * c > 1 << 22:    # keep interpret-mode wall time sane
        rows = 4096
    x = jnp.asarray(rng.standard_normal((rows, c)), dtype)
    scale = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    ref = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale
           + bias).astype(dtype)

    got = pln._ln_call(x, scale, bias, eps=1e-5, interpret=True)
    # bf16: allow one output ULP (f32 reduction-order difference in var)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=1e-2 if dtype == jnp.bfloat16 else 1e-6,
        atol=3e-2 if dtype == jnp.bfloat16 else 1e-5)


def test_pallas_layer_norm_fit_gate():
    from ovo_tpu.ops import layer_norm as pln

    assert pln.fits(4039, 1024, 2)
    assert pln.fits(1048576, 256, 2)
    assert not pln.fits(64, 1024, 2)       # tiny: dispatch overhead wins
    assert not pln.fits(4096, 144, 2)      # hiera stage-1: lanes untiled


@pytest.mark.parametrize("b,l,c,b_res", [
    (8, 512, 256, 8),      # batched residual
    (8, 512, 256, 1),      # batch-1 residual (decoder first layer)
    (4, 1024, 128, 1),
])
def test_pallas_residual_layer_norm_matches_xla(rng, b, l, c, b_res):
    """residual_layer_norm (production: decoder norm4) must match
    layer_norm(broadcast(res) + x) with f32 statistics to output-dtype
    rounding, including the batch-1 shared-residual path."""
    from ovo_tpu.ops import layer_norm as pln

    x = jnp.asarray(rng.standard_normal((b, l, c)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((b_res, l, c)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    s = (jnp.broadcast_to(res, x.shape).astype(jnp.float32)
         + x.astype(jnp.float32))
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.var(s, axis=-1, keepdims=True)
    ref = ((s - mean) * jax.lax.rsqrt(var + 1e-5) * scale
           + bias).astype(jnp.bfloat16)

    got = pln._res_ln_call(x, res, scale, bias, eps=1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=3e-2)


def test_residual_layer_norm_fit_gate():
    from ovo_tpu.ops import layer_norm as pln

    assert pln.res_ln_fits(256, 4096, 256, 2)   # decoder norm4 @ AMG
    assert pln.res_ln_fits(1, 4096, 256, 2) is False  # too small
    assert not pln.res_ln_fits(256, 4096, 144, 2)     # lanes untiled


@pytest.mark.parametrize("B,Bimg,T,L,heads,dint,dk", [
    (6, 1, 8, 256, 8, 128, 256),   # decoder layer-0: image enters batch-1
    (6, 6, 8, 256, 8, 128, 256),   # later layers: per-prompt image side
    (4, 4, 11, 384, 8, 128, 256),  # T not a multiple of 8 -> pad + t_len
])
def test_cross_proj_from_keys_matches_composition(rng, B, Bimg, T, L,
                                                  heads, dint, dk):
    """The projection-fused cross kernels (kk/vv/qq computed IN-kernel
    from the raw keys stream) against the composed reference: project on
    the host, then the per-head XLA attention. Exercises the exact
    decoder recipe -- pe folded as a batch-1 internal-dim correction,
    value bias added post-softmax (rows sum to 1)."""
    from ovo_tpu.ops import attention as att

    keys = jnp.asarray(rng.standard_normal((Bimg, L, dk)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((1, L, dk)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((dk, dint)) * 0.1, jnp.float32)
    bk = jnp.asarray(rng.standard_normal((dint,)) * 0.1, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((dk, dint)) * 0.1, jnp.float32)
    bv = jnp.asarray(rng.standard_normal((dint,)) * 0.1, jnp.float32)
    wq = jnp.asarray(rng.standard_normal((dk, dint)) * 0.1, jnp.float32)
    bq = jnp.asarray(rng.standard_normal((dint,)) * 0.1, jnp.float32)
    q_tok = jnp.asarray(rng.standard_normal((B, T, dint)), jnp.float32)
    k_tok = jnp.asarray(rng.standard_normal((B, T, dint)), jnp.float32)
    v_tok = jnp.asarray(rng.standard_normal((B, T, dint)), jnp.float32)

    # composed reference: project the image side, then attend
    kk = (keys + pe) @ wk + bk
    vv = keys @ wv + bv
    qq = (keys + pe) @ wq + bq

    # t2i: tokens query the image rows
    ref = att._xla_cross(q_tok, kk, vv, heads)
    pe_k = pe @ wk + bk                               # (1, L, dint)
    got = att.cross_t2i_from_keys(q_tok, keys, wk, wv, pe_k, bv, heads,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # i2t: image rows query the tokens
    ref = att._xla_cross(qq, k_tok, v_tok, heads)
    pe_q = pe @ wq + bq
    got = att.cross_i2t_from_keys(keys, wq, pe_q, k_tok, v_tok, heads,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_cross_proj_fit_gate():
    from ovo_tpu.ops import attention as att

    assert att._cross_proj_fits(64, 4096, 128, 256, 2)   # decoder @ AMG
    assert not att._cross_proj_fits(64, 4096, 144, 256, 2)  # D != 128
    assert not att._cross_proj_fits(64, 4100, 128, 256, 2)  # L untiled
    assert not att._cross_proj_fits(64, 1 << 21, 128, 256, 2)  # VMEM blow


@pytest.mark.parametrize("B,Bimg,T,L,heads,dint,dk", [
    (6, 1, 8, 256, 8, 128, 256),   # decoder layer-0: image enters batch-1
    (6, 6, 8, 256, 8, 128, 256),   # later layers: per-prompt image side
    (4, 4, 11, 384, 8, 128, 256),  # T not a multiple of 8 -> pad + t_len
])
def test_cross_i2t_tail_matches_composition(rng, B, Bimg, T, L, heads,
                                            dint, dk):
    """The tail-fused i2t kernel (attention + out-proj + keys residual +
    LayerNorm in one pass, PERF.md 6x) against the composed reference:
    cross_i2t_from_keys -> linear -> residual -> LN."""
    from ovo_tpu.ops import attention as att

    keys = jnp.asarray(rng.standard_normal((Bimg, L, dk)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((1, L, dk)), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((dk, dint)) * 0.1, jnp.float32)
    bq = jnp.asarray(rng.standard_normal((dint,)) * 0.1, jnp.float32)
    k_tok = jnp.asarray(rng.standard_normal((B, T, dint)), jnp.float32)
    v_tok = jnp.asarray(rng.standard_normal((B, T, dint)), jnp.float32)
    wout = jnp.asarray(rng.standard_normal((dint, dk)) * 0.1, jnp.float32)
    bout = jnp.asarray(rng.standard_normal((dk,)) * 0.1, jnp.float32)
    lns = jnp.asarray(1.0 + 0.1 * rng.standard_normal((dk,)), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal((dk,)), jnp.float32)

    qq = (keys + pe) @ wq + bq
    attn = att._xla_cross(qq, k_tok, v_tok, heads)
    y = attn @ wout + bout + keys                        # residual
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    ref = (y - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb

    pe_q = pe @ wq + bq
    got = att.cross_i2t_tail_from_keys(keys, wq, pe_q, k_tok, v_tok, wout,
                                       bout, lns, lnb, heads,
                                       interpret=True)
    assert got.shape == (B, L, dk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_cross_proj_ln_fit_gate():
    from ovo_tpu.ops import attention as att

    assert att._cross_proj_ln_fits(64, 4096, 128, 256, 2)   # decoder @ AMG
    assert not att._cross_proj_ln_fits(64, 4096, 144, 256, 2)  # D != 128
    assert not att._cross_proj_ln_fits(64, 4100, 128, 256, 2)  # L untiled


def test_rope_packed_attention_matches_composed():
    """rope_packed_attention (packed qkv + in-kernel RoPE + token-major
    out) vs the composed reference path: split -> heads -> apply_rope ->
    attention -> merge. Odd L exercises the internal sublane pad + kv
    mask."""
    import jax
    import jax.numpy as jnp
    from ovo_tpu.models.layers import apply_rope, rope2d_freqs
    from ovo_tpu.ops.attention import rope_packed_attention, xla_attention

    rng = np.random.default_rng(7)
    B, H, hd = 2, 4, 32
    D = H * hd
    for L, grid in ((145, 12), (64, 8)):
        cos, sin = rope2d_freqs(grid, grid, hd, n_prefix=1)
        cos, sin = cos[:L], sin[:L]
        qkv = jnp.asarray(rng.standard_normal((B, L, 3 * D)), jnp.float32)

        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        qh = apply_rope(qh, cos, sin)
        kh = apply_rope(kh, cos, sin)
        ref = xla_attention(qh, kh, vh)
        ref = ref.transpose(0, 2, 1, 3).reshape(B, L, D)

        got = rope_packed_attention(qkv, cos, sin, heads=H, interpret=True)
        assert got.shape == (B, L, D)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_rope_packed_dispatch_gate():
    import os
    from unittest import mock
    from ovo_tpu.ops import attention as att

    with mock.patch.object(att, "_on_tpu", return_value=True):
        assert att.use_rope_packed(112, 577, 64, 16, 2)  # PE-L 7-crop batch
        assert not att.use_rope_packed(1024, 577, 64, 16, 2)  # bh too big
        assert not att.use_rope_packed(112, 140, 64, 16, 2)  # L too small
        with mock.patch.dict(os.environ, {"OVO_NO_PALLAS": "1"}):
            assert not att.use_rope_packed(112, 577, 64, 16, 2)
    with mock.patch.object(att, "_on_tpu", return_value=False):
        assert not att.use_rope_packed(112, 577, 64, 16, 2)


def test_packed_heads_attention_matches_composed():
    """packed_heads_attention (heads sliced in-kernel from the head-packed
    layout) vs split -> transpose -> attention -> merge, incl. the q_pool
    case (Lq != Lk) and odd lengths exercising the pads + kv mask."""
    import jax.numpy as jnp
    from ovo_tpu.ops.attention import packed_heads_attention, xla_attention

    rng = np.random.default_rng(3)
    for B, lq, lk, heads, dout in ((12, 49, 49, 2, 144), (5, 36, 196, 8, 64),
                                   (9, 64, 64, 4, 288)):
        hd = dout // heads
        q = jnp.asarray(rng.standard_normal((B, lq, dout)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, lk, dout)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, lk, dout)), jnp.float32)

        def heads_t(t, l):
            return t.reshape(B, l, heads, hd).transpose(0, 2, 1, 3)

        ref = xla_attention(heads_t(q, lq), heads_t(k, lk), heads_t(v, lk))
        ref = ref.transpose(0, 2, 1, 3).reshape(B, lq, dout)
        got = packed_heads_attention(q, k, v, heads=heads, interpret=True)
        assert got.shape == (B, lq, dout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
