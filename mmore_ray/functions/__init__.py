from .textfns import clean_str, clean_text, split_words
from .hashing import sha256_hex, md5_hex, stable_u64

__all__ = [
    "clean_str",
    "clean_text",
    "split_words",
    "sha256_hex",
    "md5_hex",
    "stable_u64",
]
