from . import operators, pallas_cgs, pallas_spmv, hermitian_split, filters
