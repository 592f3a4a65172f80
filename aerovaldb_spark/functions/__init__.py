"""Column-function library: shared scalar helpers + multimodal ops."""

from __future__ import annotations

from .png_codec import decode_png, encode_png, png_mean_luma
from .multimodal import (
    MEDIA_SCHEMA,
    WAV_SAMPLE_RATE,
    decode_images,
    extract_features,
    parse_media_headers,
    sample_frames,
    sniff_image_extension,
    synthetic_media,
)

__all__ = [
    "MEDIA_SCHEMA",
    "WAV_SAMPLE_RATE",
    "decode_images",
    "decode_png",
    "encode_png",
    "extract_features",
    "png_mean_luma",
    "parse_media_headers",
    "sample_frames",
    "sniff_image_extension",
    "synthetic_media",
]
