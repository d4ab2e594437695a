from medmoe_tpu.data.tokenizer import WordPieceTokenizer  # noqa: F401
