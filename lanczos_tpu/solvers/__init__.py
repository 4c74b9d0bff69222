from . import lanczos, exponentiator
