from . import lanczos, lanczos_fused, exponentiator, exponentiator_fused, block_lanczos, thick_restart
