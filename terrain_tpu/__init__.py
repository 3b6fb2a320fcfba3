"""terrain_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for two-stage
GAN terrain generation, built from scratch with the capabilities of
christopher-beckham/gan-heightmaps (reference mounted at /root/reference).

Stage 1: a DCGAN maps a uniform latent z in U[0,1)^latent_dim to a 512x512
grayscale heightmap.  Stage 2: a pix2pix U-Net + PatchGAN translates the
heightmap into a 512x512 RGB texture (reference: pix2pix.py:33-35).

Design (TPU-first, not a port):
  * NHWC layouts everywhere; channel dims feed the 128-lane MXU tiles.
  * fp32 parameters, optional bf16 compute (conv/matmul accumulate fp32).
  * One jit-compiled train step performs the reference's *simultaneous*
    four-network update (pix2pix.py:131-142) via a single gradient pass with
    stop-gradient partitioning, so XLA CSEs the shared forward.
  * Device-resident uint8 dataset + in-graph gather/normalize/augment: the
    host only ships int32 indices per step.
  * Data/tensor parallelism via jax.sharding.Mesh + NamedSharding; XLA
    lowers gradient reductions to ICI collectives.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name == "TwoStageGAN":
        from terrain_tpu.train.trainer import TwoStageGAN

        return TwoStageGAN
    if name == "EXPERIMENTS":
        from terrain_tpu.experiments import EXPERIMENTS

        return EXPERIMENTS
    raise AttributeError(name)
