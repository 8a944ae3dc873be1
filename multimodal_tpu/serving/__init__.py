from multimodal_tpu.serving.engine import InferenceEngine, Request, RequestOutput
from multimodal_tpu.serving.embedding import EmbeddingServer

__all__ = [
    "EmbeddingServer",
    "InferenceEngine",
    "Request",
    "RequestOutput",
]
