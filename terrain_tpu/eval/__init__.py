"""Evaluation layer: weight-free sample-quality metrics (SWD pyramid +
terrain-domain elevation/slope distribution W1)."""

from terrain_tpu.eval.swd import laplacian_pyramid, sliced_wasserstein, swd_pyramid
from terrain_tpu.eval.terrain import terrain_stats

__all__ = ["swd_pyramid", "sliced_wasserstein", "laplacian_pyramid",
           "terrain_stats"]
