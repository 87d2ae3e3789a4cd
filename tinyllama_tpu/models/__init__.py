from tinyllama_tpu.models import llama

__all__ = ["llama"]
