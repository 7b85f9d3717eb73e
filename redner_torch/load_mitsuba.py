"""Mitsuba XML scene loading with torch outputs
(reference pyredner/load_mitsuba.py mirror)."""

from __future__ import annotations


def load_mitsuba(filename: str):
    """Parse a Mitsuba scene XML into a redner_torch.Scene."""
    import redner_tpu as rt
    from redner_torch._convert import scene_from_jax

    return scene_from_jax(rt.load_mitsuba(filename))
