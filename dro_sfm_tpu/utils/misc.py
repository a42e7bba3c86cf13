"""Small helpers: dict filtering, list coercion, shape checks.

Rebuild of `/root/reference/dro_sfm/utils/misc.py:6-80` and
`/root/reference/dro_sfm/utils/types.py:8-42`.
"""
from __future__ import annotations

from typing import Any, Iterable, List, Sequence

import numpy as np


def filter_dict(dictionary: dict, keywords: Iterable[str]) -> List[str]:
    """Keys of ``dictionary`` present in ``keywords`` (`misc.py:6-24`)."""
    return [k for k in keywords if k in dictionary]


def make_list(var: Any, n: int | None = None) -> list:
    """Wrap into a list, optionally broadcast to length n (`misc.py:27-58`)."""
    var = var if isinstance(var, list) else [var]
    if n is None:
        return var
    if len(var) == 1:
        return var * n
    assert len(var) == n, "Wrong list length for make_list"
    return var


def same_shape(shape1: Sequence[int], shape2: Sequence[int]) -> bool:
    """True if two shapes match (`misc.py:61-80`)."""
    return len(shape1) == len(shape2) and all(
        a == b for a, b in zip(shape1, shape2))


# -- type predicates (`types.py:8-42`) --------------------------------------

def is_numpy(data) -> bool:
    return isinstance(data, np.ndarray)


def is_array(data) -> bool:
    try:
        import jax
        return isinstance(data, (np.ndarray, jax.Array))
    except ImportError:
        return isinstance(data, np.ndarray)


def is_tuple(data) -> bool:
    return isinstance(data, tuple)


def is_list(data) -> bool:
    return isinstance(data, list)


def is_seq(data) -> bool:
    return isinstance(data, (list, tuple))


def is_dict(data) -> bool:
    return isinstance(data, dict)


def is_str(data) -> bool:
    return isinstance(data, str)


def is_int(data) -> bool:
    return isinstance(data, int)


def apply_platform_env() -> None:
    """Honor ``DRO_SFM_PLATFORM`` (e.g. ``cpu``) for CLI entry points.

    The dev environment's sitecustomize force-registers the tunneled TPU
    and ignores ``JAX_PLATFORMS``; pinning must happen through jax.config
    BEFORE the first backend use. Every scripts/*.py main calls this first
    so tests (and users) can run the CLIs on a chosen platform.
    """
    import os
    plat = os.environ.get("DRO_SFM_PLATFORM")
    if plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat)
        except Exception as e:
            # A failed pin (backend already initialized, typo'd name)
            # must be loud: the CLI would otherwise silently run on the
            # force-registered accelerator.
            import warnings
            warnings.warn(
                f"DRO_SFM_PLATFORM={plat!r} could not be applied: {e}")
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Turn on JAX's persistent compilation cache for the CLIs.

    Fresh XLA programs take minutes to compile on this backend, and a
    multi-dataset validation sweep compiles one eval program per input
    shape. The persistent cache turns every repeat run into a disk hit.
    Defaults to ``~/.cache/dro_sfm_tpu/jax_cache``; an explicitly set
    ``JAX_COMPILATION_CACHE_DIR`` (including the empty string, meaning
    "off") always wins, so this is only a default, not an override.
    """
    import os
    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        return  # user decision (empty string disables)
    path = os.path.expanduser("~/.cache/dro_sfm_tpu/jax_cache")
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception as e:
        # A failed cache-dir set must be loud (matches the platform-pin
        # policy above): the CLI would otherwise recompile every run.
        import warnings
        warnings.warn(f"persistent compilation cache could not be enabled: {e}")
        return
    try:
        # Cache even fast compiles: with the remote-compile relay the
        # wall-clock cost is dominated by the round-trip, which the
        # default 1 s floor (measured compile time) underestimates.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knob: keep the cache-dir default
