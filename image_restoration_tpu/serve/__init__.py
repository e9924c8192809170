from .pipeline import PlatePipeline, image_to_base64, base64_to_image

__all__ = ["PlatePipeline", "image_to_base64", "base64_to_image"]
