"""Timing / observability (reference pyredner.set_print_timing,
pyredner/render_pytorch.py:31-44,618-620,692-694,1071-1073).

`print_timing(True)` makes `timed(...)` blocks report wall-clock; for deep
profiling use `profile_trace(dir)` which wraps jax.profiler traces viewable
in XProf/TensorBoard (the TPU-native answer to the reference's prints)."""

from __future__ import annotations

import contextlib
import time

_print_timing = False


def set_print_timing(v: bool):
    global _print_timing
    _print_timing = bool(v)


def get_print_timing() -> bool:
    return _print_timing


@contextlib.contextmanager
def timed(label: str):
    if not _print_timing:
        yield
        return
    t0 = time.perf_counter()
    yield
    print(f"{label}: {(time.perf_counter() - t0) * 1e3:.2f} ms", flush=True)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
