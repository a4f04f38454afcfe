from .spmv import SpmvAlgorithm, SpmvHandle, spmm, spmv
