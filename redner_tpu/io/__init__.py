"""Scene and image IO (reference pyredner loaders)."""

from redner_tpu.io.image import imread, imwrite, linear_to_srgb, srgb_to_linear
from redner_tpu.io.obj import load_obj, save_mtl, save_obj
from redner_tpu.io.serialized import load_serialized

__all__ = [
    "imread",
    "imwrite",
    "linear_to_srgb",
    "srgb_to_linear",
    "load_obj",
    "save_obj",
    "save_mtl",
    "load_serialized",
    "load_mitsuba",
]


def load_mitsuba(filename, **kwargs):
    from redner_tpu.io.mitsuba import load_mitsuba as _lm

    return _lm(filename, **kwargs)
