"""Executable component-inventory checklist (SURVEY.md §2).

Each reference component must have a living counterpart with the expected
public surface.  This is intentionally a shallow existence/API test — the
behavioral depth lives in the per-component test files.
"""

import os

import pytest


def test_experiment_runner_surface():
    from terrain_tpu.experiments import EXPERIMENTS, get_iterators

    for name in ("test1_nobn", "test1_nobn_finetunep2p_bilin",
                 "test1_nobn_bilin_both"):
        assert name in EXPERIMENTS  # experiments.py:22-125
    assert callable(get_iterators)  # experiments.py:10-18


def test_launch_script_exists():
    assert os.path.exists("scripts/experiment_tpu.sh")  # experiment.5.sh


def test_two_stage_orchestrator_surface():
    from terrain_tpu.train.trainer import TwoStageGAN

    for method in ("train", "save_model", "load_model", "generate_atob",
                   "generate_gz", "generate_interpolation",
                   "generate_interpolation_clip"):
        assert hasattr(TwoStageGAN, method)  # pix2pix.py:19-425
    assert TwoStageGAN.train_keys == [
        "dcgan_gen", "dcgan_disc", "p2p_gen", "p2p_recon", "p2p_disc"]


def test_loss_and_optimizer_surface():
    from terrain_tpu.train import adv_loss, reconstruction_loss
    from terrain_tpu.train.optim import OPTIMIZERS

    assert {"rmsprop", "adam"} <= set(OPTIMIZERS)  # lasagne updates


def test_architectures_surface():
    from terrain_tpu.models import dcgan, p2p

    assert callable(dcgan.default_generator)      # dcgan.py:14
    assert callable(dcgan.default_discriminator)  # dcgan.py:35
    assert callable(p2p.g_unet)                   # p2p.py:126
    assert callable(p2p.g_unet_256)               # p2p.py:29
    assert callable(p2p.discriminator)            # p2p.py:278
    assert callable(p2p.discriminator2)           # p2p.py:294
    assert callable(p2p.fake_generator)           # p2p.py:314
    assert callable(p2p.fake_discriminator)       # p2p.py:320


def test_custom_ops_surface():
    from terrain_tpu.ops import upsample_bilinear_2x  # layers.py:13-26
    from terrain_tpu.ops.blur import gaussian_blur  # gaussian_blur.ipynb
    from terrain_tpu.ops.fused import deconv2x2, upsample2x_nearest_conv
    from terrain_tpu.ops.pallas.bilinear import bilinear_2x_pallas


def test_data_pipeline_surface():
    from terrain_tpu.data import (
        DeviceDataset,
        Hdf5Iterator,  # util.py:45-62
        Prefetcher,
        augment_pair,  # ImageDataGenerator semantics, experiments.py:13
    )
    from terrain_tpu.data.crops import RasterCropIterator

    assert hasattr(Hdf5Iterator, "next")  # reference py2 spelling


def test_dataset_builder_surface():
    # prototype_cropping_code.ipynb as a script
    assert os.path.exists("tools/build_dataset.py")
    assert os.path.exists("tools/make_synthetic.py")
    assert os.path.exists("tools/import_reference_weights.py")
    assert os.path.exists("tools/render_clip.py")


def test_checkpoint_and_schedule_surface():
    from terrain_tpu.train.checkpoint import load_model, save_model
    from terrain_tpu.train.schedule import ReduceLROnPlateau  # keras_ports.py


def test_metrics_and_images_surface():
    from terrain_tpu.utils import (
        compose_imgs,      # util.py:87
        convert_to_rgb,    # util.py:69
        plot_grid,         # util.py:101
        write_image_grid,  # image_grid.py:6
    )
    from terrain_tpu.utils.async_writer import AsyncWriter
    from terrain_tpu.utils.profiling import StepTimer, trace


def test_parallelism_surface():
    # NEW components (the reference had none, SURVEY.md §2 absent rows)
    from terrain_tpu.parallel import (
        batch_sharding,
        make_mesh,
        spatial_batch_sharding,
        tp_shardings,
    )
    from terrain_tpu.parallel.distributed import host_batch_slice, initialize


def test_native_components_surface():
    from terrain_tpu.data import native

    assert os.path.exists("terrain_tpu/native/terrain_io.cpp")
    assert callable(native.crop_batch_u8)
    assert callable(native.normalize_u8_f32)
    assert callable(native.zero_fraction)


def test_eval_surface():
    from terrain_tpu.eval import swd_pyramid


def test_entry_points_exist():
    assert os.path.exists("bench.py")
    assert os.path.exists("__graft_entry__.py")
    import __graft_entry__ as ge

    assert callable(ge.entry) and callable(ge.dryrun_multichip)
