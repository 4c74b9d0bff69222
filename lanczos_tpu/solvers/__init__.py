from . import lanczos, lanczos_fused, exponentiator, exponentiator_fused
