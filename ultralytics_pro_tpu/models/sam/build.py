"""SAM model assembly (reference ultralytics/models/sam/build.py:24-66,130).

build_sam_vit_b/l/h mirror the reference encoder configs; `build_sam(name)`
dispatches on the checkpoint-style name ("sam_b.pt" -> vit_b). SAM2/MobileSAM
(Hiera/TinyViT trunks) are planned follow-ups.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.models.sam.modules import (
    ImageEncoderViT,
    MaskDecoder,
    PromptEncoder,
)

IMG_SIZE = 1024
EMBED_SIZE = IMG_SIZE // 16
PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


class SAMModel(nn.Module):
    """Image encoder + prompt encoder + mask decoder (reference
    modules/sam.py SAMModel)."""

    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    img_size: int = IMG_SIZE
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.image_encoder = ImageEncoderViT(
            img_size=self.img_size,
            embed_dim=self.encoder_embed_dim,
            depth=self.encoder_depth,
            num_heads=self.encoder_num_heads,
            global_attn_indexes=self.encoder_global_attn_indexes,
            dtype=self.dtype,
        )
        g = self.img_size // 16
        self.prompt_encoder = PromptEncoder(
            embed_dim=256, image_embedding_size=(g, g),
            input_image_size=(self.img_size, self.img_size), mask_in_chans=16,
        )
        self.mask_decoder = MaskDecoder(transformer_dim=256, num_multimask_outputs=3)

    def embed_image(self, x):
        """(B, S, S, 3) uint8/float pixels -> (B, S/16, S/16, 256)."""
        x = (x.astype(jnp.float32) - jnp.array(PIXEL_MEAN)) / jnp.array(PIXEL_STD)
        return self.image_encoder(x)

    def decode(self, image_embed, points, labels, mask_input, multimask_output: bool):
        """Prompt-conditioned masks.

        points (B, N, 2) in model-input pixel coords, labels (B, N) in
        {-1 pad, 0 neg, 1 pos, 2 box-tl, 3 box-br}, mask_input (B, 4g, 4g, 1)
        or None. Returns (masks (B, M, 4g, 4g) logits, iou (B, M)).
        """
        sparse, dense = self.prompt_encoder(points, labels, mask_input)
        image_pe = self.prompt_encoder.get_dense_pe()[None]
        return self.mask_decoder(image_embed, image_pe, sparse, dense, multimask_output)

    def __call__(self, x, points, labels):
        """Convenience e2e: embed + single-prompt decode (init/tracing path).

        Init passes a zero mask prompt so the mask-downscaling branch's params
        materialize — official checkpoints always carry them (import_weights
        covers every leaf strictly)."""
        emb = self.embed_image(x)
        g4 = 4 * (self.img_size // 16)
        dummy_mask = jnp.zeros((x.shape[0], g4, g4, 1), jnp.float32)
        return self.decode(emb, points, labels, dummy_mask, True)


def build_sam_vit_b(img_size: int = IMG_SIZE, dtype=jnp.float32) -> SAMModel:
    return SAMModel(768, 12, 12, (2, 5, 8, 11), img_size=img_size, dtype=dtype)


def build_sam_vit_l(img_size: int = IMG_SIZE, dtype=jnp.float32) -> SAMModel:
    return SAMModel(1024, 24, 16, (5, 11, 17, 23), img_size=img_size, dtype=dtype)


def build_sam_vit_h(img_size: int = IMG_SIZE, dtype=jnp.float32) -> SAMModel:
    return SAMModel(1280, 32, 16, (7, 15, 23, 31), img_size=img_size, dtype=dtype)


class MobileSAMModel(SAMModel):
    """SAM with the TinyViT encoder (reference build.py build_mobile_sam +
    tiny_encoder.py:979)."""

    def setup(self):
        from ultralytics_pro_tpu.models.sam.sam2 import TinyViT

        self.image_encoder = TinyViT(dtype=self.dtype)
        g = self.img_size // 16
        self.prompt_encoder = PromptEncoder(
            embed_dim=256, image_embedding_size=(g, g),
            input_image_size=(self.img_size, self.img_size), mask_in_chans=16,
        )
        self.mask_decoder = MaskDecoder(transformer_dim=256, num_multimask_outputs=3)

    def embed_image(self, x):
        return self.image_encoder(x)  # TinyViT normalizes internally


def build_mobile_sam(img_size: int = IMG_SIZE, dtype=jnp.float32) -> MobileSAMModel:
    return MobileSAMModel(img_size=img_size, dtype=dtype)


def _build_sam2_named(name):
    def build(img_size: int = IMG_SIZE, dtype=jnp.float32):
        from ultralytics_pro_tpu.models.sam.sam2 import build_sam2

        return build_sam2(name, img_size=img_size, dtype=dtype)
    return build


SAM_BUILDERS = {
    "sam_b": build_sam_vit_b,
    "sam_l": build_sam_vit_l,
    "sam_h": build_sam_vit_h,
    "mobile_sam": build_mobile_sam,
    "sam2_t": _build_sam2_named("sam2_t"),
    "sam2_s": _build_sam2_named("sam2_s"),
    "sam2_b": _build_sam2_named("sam2_b"),
    "sam2_l": _build_sam2_named("sam2_l"),
    "sam2.1_t": _build_sam2_named("sam2_t"),
}


def build_sam(name: str = "sam_b", img_size: int = IMG_SIZE, dtype=jnp.float32):
    """Dispatch on a checkpoint-style name (reference build.py:326)."""
    stem = name.split("/")[-1].split(".pt")[0].lower().replace("-", "_")
    # longest-prefix match so sam2_* doesn't fall into sam_*
    for key in sorted(SAM_BUILDERS, key=len, reverse=True):
        if stem.startswith(key):
            return SAM_BUILDERS[key](img_size=img_size, dtype=dtype)
    raise ValueError(f"unknown SAM variant {name!r}; available: {sorted(SAM_BUILDERS)}")
