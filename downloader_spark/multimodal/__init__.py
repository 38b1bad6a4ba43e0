"""Multimodal column plumbing (binary payloads + typed metadata)."""

from .media import (
    MEDIA_META_SCHEMA,
    decode_image_stub,
    media_features_udf,
    resize_block_mean_udf,
    sample_frames_plan,
    synth_media_from_embeddings,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "decode_image_stub",
    "media_features_udf",
    "resize_block_mean_udf",
    "sample_frames_plan",
    "synth_media_from_embeddings",
]
