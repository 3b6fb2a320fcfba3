"""Evaluation layer: weight-free sample-quality metrics (SWD pyramid)."""

from terrain_tpu.eval.swd import laplacian_pyramid, sliced_wasserstein, swd_pyramid

__all__ = ["swd_pyramid", "sliced_wasserstein", "laplacian_pyramid"]
