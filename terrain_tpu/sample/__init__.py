"""Inference layer: jitted samplers for latent sampling, A->B translation,
and the fused two-stage z -> heightmap -> texture pipeline."""

from terrain_tpu.sample.samplers import (
    make_atob_sampler,
    make_two_stage_sampler,
    make_z_sampler,
)

__all__ = ["make_z_sampler", "make_atob_sampler", "make_two_stage_sampler"]
