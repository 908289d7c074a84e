"""Fused whole-block Pallas kernels vs the XLA transformer block."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ovo_tpu.models import layers as L
from ovo_tpu.ops.fused_block import fused_transformer_block


@pytest.mark.parametrize("causal,rope", [(False, False), (False, True),
                                         (True, False)])
def test_fused_block_matches_xla(rng, causal, rope):
    D, heads, Lp = 256, 4, 128
    p = L.init_block(jax.random.PRNGKey(0), D, heads, mlp_ratio=4.0)
    x = jnp.asarray(rng.standard_normal((2, Lp, D)).astype(np.float32))
    rope_t = None
    if rope:
        rope_t = L.rope2d_freqs(8, 16, D // heads)  # 128 positions
    ref = L.transformer_block(p, x, heads, rope=rope_t, causal=causal)
    got = fused_transformer_block(p, x, heads, rope=rope_t, causal=causal,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_block_quick_gelu(rng):
    D, heads, Lp = 256, 4, 128
    p = L.init_block(jax.random.PRNGKey(1), D, heads)
    x = jnp.asarray(rng.standard_normal((1, Lp, D)).astype(np.float32))
    ref = L.transformer_block(p, x, heads, act="quick_gelu")
    got = fused_transformer_block(p, x, heads, act="quick_gelu",
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_features_fused_matches_xla(rng):
    """Full tower with token padding (577 -> 640) through the fused path
    equals the XLA path (interpret-mode kernels on CPU)."""
    from ovo_tpu.models import vit as vit_mod
    from ovo_tpu.models.clip import CLIPModel

    model = CLIPModel.random_init("tiny-pe")
    cfg = model.cfg.vision
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    ref = vit_mod.forward_features(model.params["visual"], cfg, imgs)
    got = vit_mod.forward_features(model.params["visual"], cfg, imgs,
                                   attn_impl="fused_block")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_fused_mlp_token_blocks_match_whole(rng):
    """token_block slabbing (for long Hiera-stage token streams) computes
    the same result as the whole-Lp slab and as the XLA mlp."""
    from ovo_tpu.ops.fused_block import fused_mlp_block
    D, hidden, Lp = 192, 576, 512
    key = jax.random.PRNGKey(2)
    p = {"fc": {"w": jax.random.normal(key, (D, hidden)) * 0.05,
                "b": jnp.zeros((hidden,))},
         "proj": {"w": jax.random.normal(key, (hidden, D)) * 0.05,
                  "b": jnp.zeros((D,))}}
    ln = {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}
    x = jnp.asarray(rng.standard_normal((Lp, D)).astype(np.float32))
    ref = x + L.mlp(p, L.layer_norm(ln, x))
    whole = fused_mlp_block(x, p["fc"]["w"], p["fc"]["b"], p["proj"]["w"],
                            p["proj"]["b"], ln["scale"], ln["bias"],
                            chunk=288, interpret=True)
    blocked = fused_mlp_block(x, p["fc"]["w"], p["fc"]["b"], p["proj"]["w"],
                              p["proj"]["b"], ln["scale"], ln["bias"],
                              chunk=288, token_block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(whole),
                               atol=0, rtol=0)
