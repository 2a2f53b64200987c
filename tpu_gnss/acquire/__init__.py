from .search import AcqResult, Searcher, acquire_from_fft, code_fft_table
