from multimodal_tpu.serving.engine import InferenceEngine, Request, RequestOutput
from multimodal_tpu.serving.blip2_caption_server import (
    Blip2CaptionAdapter,
    Blip2CaptionServer,
)
from multimodal_tpu.serving.caption_server import (
    CoCaCaptionAdapter,
    CoCaCaptionServer,
)
from multimodal_tpu.serving.embedding import EmbeddingServer
from multimodal_tpu.serving.http_server import ServingFrontend
from multimodal_tpu.serving.multi_lora import multi_lora_scope, stack_adapters
from multimodal_tpu.serving.video_gpt_server import (
    VideoGPTServer,
    VideoGPTServingAdapter,
)

__all__ = [
    "Blip2CaptionAdapter",
    "Blip2CaptionServer",
    "CoCaCaptionAdapter",
    "CoCaCaptionServer",
    "EmbeddingServer",
    "InferenceEngine",
    "Request",
    "RequestOutput",
    "ServingFrontend",
    "VideoGPTServer",
    "VideoGPTServingAdapter",
    "multi_lora_scope",
    "stack_adapters",
]
