"""Host-side utilities: image post-processing, grid writers, CSV metrics."""

from terrain_tpu.utils.images import (
    compose_imgs,
    convert_to_rgb,
    plot_grid,
    save_png,
    save_png_u8,
    to_u8_device,
    write_image_grid,
)

__all__ = [
    "convert_to_rgb",
    "compose_imgs",
    "plot_grid",
    "save_png",
    "save_png_u8",
    "to_u8_device",
    "write_image_grid",
]
