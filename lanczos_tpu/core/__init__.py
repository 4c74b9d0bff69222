from . import types, linalg, tridiagonal, df64
