from multimodal_tpu.examples.long_context.model import LongContextLM

__all__ = ["LongContextLM"]
