from . import operators, pallas_spmv
