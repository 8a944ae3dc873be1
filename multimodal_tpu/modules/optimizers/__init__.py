from multimodal_tpu.modules.optimizers.anyprecision import anyprecision_adamw

__all__ = ["anyprecision_adamw"]
