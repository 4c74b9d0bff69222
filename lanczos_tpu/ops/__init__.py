from . import operators, pallas_spmv, hermitian_split
