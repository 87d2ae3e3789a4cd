from tinyllama_tpu.io.tokenizer import Tokenizer

__all__ = ["Tokenizer"]
