from .ppl import delta_ppl, perplexity  # noqa: F401
