"""SAM2-class segmentation model: Hiera trunk + FPN neck + prompt encoder +
mask decoder, assembled for batched grid-prompted inference.

Reference dependency being replaced: the SAM2 package the reference drives
through SAM2AutomaticMaskGenerator (segment_utils.py:288-309).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from .decoder import decode_masks, init_mask_decoder
from .hiera import HIERA_CONFIGS, HieraConfig, hiera_forward, init_hiera
from .neck import init_neck, neck_forward, sine_pos_encoding
from .prompt import encode_points, init_prompt_encoder, pe_grid
from .vitdet import VITDET_CONFIGS, ViTDetConfig, init_vitdet, vitdet_forward

Array = jax.Array
Params = Dict[str, Any]

SAM_MEAN = (0.485, 0.456, 0.406)
SAM_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    encoder: str = "hiera_l"
    image_size: int = 1024
    d_model: int = 256
    compute_dtype: str = "bfloat16"   # MXU-native inference precision

    @property
    def family(self) -> str:
        """"sam1" for ViT-det encoders (reference sam_version ""), "sam2"
        for Hiera (sam_version 2/2.1)."""
        return "sam1" if self.encoder.startswith("vit") else "sam2"

    @property
    def hiera(self) -> HieraConfig:
        return HIERA_CONFIGS[self.encoder]

    @property
    def vitdet(self) -> ViTDetConfig:
        return VITDET_CONFIGS[self.encoder]

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


class SAMModel:
    def __init__(self, cfg: SAMConfig, params: Params):
        self.cfg = cfg
        self.params = params
        self._mean = jnp.asarray(SAM_MEAN, jnp.float32)
        self._std = jnp.asarray(SAM_STD, jnp.float32)

    @classmethod
    def random_init(cls, encoder: str = "hiera_l", image_size: int = 1024,
                    seed: int = 0) -> "SAMModel":
        cfg = SAMConfig(encoder=encoder, image_size=image_size)
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        if cfg.family == "sam1":
            # ViT-det trunk carries its own neck; the SAM1 decoder has no
            # object-score token and no high-res skip convs
            params = {
                "trunk": init_vitdet(ks[0], cfg.vitdet),
                "prompt": init_prompt_encoder(ks[2], cfg.d_model),
                "decoder": init_mask_decoder(ks[3], cfg.d_model,
                                             high_res=False,
                                             obj_token=False),
            }
            return cls(cfg, params)
        hcfg = cfg.hiera
        dim = hcfg.embed_dim
        channels = [int(dim * hcfg.dim_mul ** i) for i in range(4)]
        params = {
            "trunk": init_hiera(ks[0], hcfg),
            "neck": init_neck(ks[1], tuple(channels), cfg.d_model),
            "prompt": init_prompt_encoder(ks[2], cfg.d_model),
            "decoder": init_mask_decoder(ks[3], cfg.d_model),
        }
        return cls(cfg, params)

    # ------------------------------------------------------------------
    def resized_hw(self, h: int, w: int) -> Tuple[int, int]:
        """SAM1 ResizeLongestSide target dims (utils/transforms.py
        get_preprocess_shape: int(dim * S/max + 0.5))."""
        s = self.cfg.image_size
        scale = s / max(h, w)
        return int(h * scale + 0.5), int(w * scale + 0.5)

    def point_scale(self, h: int, w: int) -> Tuple[float, float]:
        """(sx, sy) mapping [0,1] original-image point prompts into the
        model's input square. SAM2: identity (square resize). SAM1: the
        image occupies only the top-left (nh, nw) of the padded square."""
        if self.cfg.family != "sam1":
            return (1.0, 1.0)
        nh, nw = self.resized_hw(h, w)
        s = self.cfg.image_size
        return (nw / s, nh / s)

    def preprocess(self, image: Array) -> Array:
        """(H, W, 3) float [0,1] -> (1, S, S, 3) normalized. SAM2: square
        resize (SAM2 predictor convention). SAM1: aspect-preserving resize
        of the longest side + zero padding bottom/right (the original
        predictor's ResizeLongestSide + pad; zero = the normalized mean)."""
        s = self.cfg.image_size
        from ...ops.resize import resize_channels_last

        if self.cfg.family == "sam1":
            h, w = image.shape[:2]
            nh, nw = self.resized_hw(h, w)
            img = resize_channels_last(image, (nh, nw))
            img = (img - self._mean) / self._std
            img = jnp.pad(img, ((0, s - nh), (0, s - nw), (0, 0)))
            return img[None].astype(self.cfg.dtype)
        img = resize_channels_last(image, (s, s))
        return ((img - self._mean) / self._std)[None].astype(self.cfg.dtype)

    def encode_image(self, image: Array) -> Tuple[Array, List[Array]]:
        """-> (image_embed (H16, W16, d), high_res [(H4, W4, 32),
        (H8, W8, 64)]) for the decoder. SAM1 (ViT-det) has no high-res
        skip features: returns (embed, None)."""
        if self.cfg.family == "sam1":
            emb = vitdet_forward(self.params["trunk"], self.cfg.vitdet,
                                 image)
            return emb[0], None
        feats = hiera_forward(self.params["trunk"], self.cfg.hiera, image)
        fpn = neck_forward(self.params["neck"], feats)
        # scalp: discard the lowest-resolution level (stride 32)
        s4, s8, s16 = fpn[0], fpn[1], fpn[2]
        dec = self.params["decoder"]

        def conv1x1(p, x):
            out = jax.lax.conv_general_dilated(
                x, p["w"].astype(x.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)
            return out + p["b"].astype(x.dtype)

        high_res = [conv1x1(dec["conv_s0"], s4)[0], conv1x1(dec["conv_s1"], s8)[0]]
        return s16[0], high_res

    def decode_grid(self, image_embed: Array, high_res: List[Array],
                    points01: Array, mask_channels=None,
                    blocked: bool = False,
                    top_prompts=None) -> Dict[str, Array]:
        """Batched single-point prompts: points01 (P, 2) in [0,1] -> masks
        (P', C, H4, W4) logits + iou (P', C) over ``mask_channels``
        (default all 4; P' = top_prompts if the predicted-IoU prompt gate
        is active, see decode_masks). ``blocked=True`` returns masks in the
        decoder's blocked layout (see decode_masks)."""
        H, W, d = image_embed.shape
        sparse = encode_points(
            self.params["prompt"], points01[:, None, :],
            jnp.ones((points01.shape[0], 1), jnp.int32))
        image_pe = pe_grid(self.params["prompt"], H, W)
        return decode_masks(self.params["decoder"], image_embed, image_pe,
                            sparse, high_res_feats=high_res,
                            mask_channels=mask_channels, blocked=blocked,
                            top_prompts=top_prompts)
