from sskd_tpu.tokenization.wordpiece import (
    WordPieceTokenizer,
    get_default_tokenizer,
)

__all__ = ["WordPieceTokenizer", "get_default_tokenizer"]
