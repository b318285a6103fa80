from .pipeline import TextImageLoader
from .tokenizer import SimpleTokenizer, tokenizer

__all__ = ["SimpleTokenizer", "TextImageLoader", "tokenizer"]
