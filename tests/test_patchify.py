"""Patch-embed matmul formulations match lax.conv (PERF.md 6z).

Reference semantics: SAM2 PatchEmbed 7x7/stride-4/pad-3
(/root/reference frame of `sam2` Hiera patch embed used via
`segment_utils.py:291-292`) and SAM1 ViT-det 16x16/stride-16.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovo_tpu.ops.patchify import patch_embed_nonoverlap, patch_embed_s4


@pytest.mark.parametrize("hw", [(64, 96), (128, 128), (32, 64)])
def test_s4_matches_conv(hw):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((2, *hw, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        imgs, w, (4, 4), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b
    got = patch_embed_s4(imgs, w, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_nonoverlap_matches_conv():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((16, 16, 3, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        imgs, w, (16, 16), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b
    got = patch_embed_nonoverlap(imgs, w, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_s4_bf16_close_to_f32_conv():
    """bf16 inputs with f32 accumulation stay within bf16-grade error of
    the f32 conv (the production dtype path)."""
    rng = np.random.default_rng(2)
    imgs32 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    w32 = jnp.asarray(rng.standard_normal((7, 7, 3, 16)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        imgs32, w32, (4, 4), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    got = patch_embed_s4(imgs32.astype(jnp.bfloat16),
                         w32.astype(jnp.bfloat16), None)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.05
