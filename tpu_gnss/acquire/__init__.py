from .search import AcqResult, Searcher, acquire_from_fft, code_fft_table
from .folded import FoldedResult, FoldedSearcher, refine_peak

__all__ = ["AcqResult", "Searcher", "acquire_from_fft", "code_fft_table",
           "FoldedResult", "FoldedSearcher", "refine_peak"]
