from .assets import (
    RAW_IMAGE_MAGIC,
    RAW_AUDIO_MAGIC,
    RAW_VIDEO_MAGIC,
    synthesize_assets,
    assets_from_documents,
    audio_assets_from_documents,
    video_assets_from_documents,
    wav_assets_from_documents,
    png_assets_from_documents,
    jpeg_assets_from_documents,
)
from .decode import (
    decode_images,
    resize_images,
    image_features,
    frame_sample,
    frame_features,
    audio_features,
)

__all__ = [
    "RAW_IMAGE_MAGIC",
    "RAW_AUDIO_MAGIC",
    "RAW_VIDEO_MAGIC",
    "synthesize_assets",
    "assets_from_documents",
    "decode_images",
    "resize_images",
    "image_features",
    "frame_sample",
    "frame_features",
    "audio_features",
    "wav_assets_from_documents",
    "png_assets_from_documents",
    "jpeg_assets_from_documents",
    "video_assets_from_documents",
]
