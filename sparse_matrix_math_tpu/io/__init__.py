from .dispatch import load_matrix, load_matrix_csr, load_matrix_df
from .matrix_market import MatrixLoadStatus, MatrixMarketError, load_matrix_market
from .smmdt import load_smmdt, save_dense_text
