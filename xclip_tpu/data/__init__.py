from .pipeline import TextImageLoader
from .sources import ImageFolderDataset, load_image
from .tokenizer import SimpleTokenizer, tokenizer

__all__ = ["ImageFolderDataset", "SimpleTokenizer", "TextImageLoader",
           "load_image", "tokenizer"]
