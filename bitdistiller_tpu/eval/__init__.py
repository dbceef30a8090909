from .ppl import load_wikitext2_test, make_nll_fn, perplexity, prepare_blocks

__all__ = ["load_wikitext2_test", "make_nll_fn", "perplexity", "prepare_blocks"]
