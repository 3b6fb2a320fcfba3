"""Data layer: parity HDF5 iterator, device-resident cache, on-device paired
augmentation, host->device prefetch, and synthetic data for tests."""

from terrain_tpu.data.augment import augment_pair, identity_pair
from terrain_tpu.data.device_cache import DeviceDataset
from terrain_tpu.data.hdf5 import (
    Hdf5Iterator,
    epoch_index_schedule,
    get_slices,
    normalize_pair,
)
from terrain_tpu.data.prefetch import Prefetcher

__all__ = [
    "augment_pair",
    "identity_pair",
    "DeviceDataset",
    "Hdf5Iterator",
    "epoch_index_schedule",
    "get_slices",
    "normalize_pair",
    "Prefetcher",
]
