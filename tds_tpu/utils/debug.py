"""Numerical-health guards (the reference's nan-trap analogs).

The reference arms FE_INVALID traps (base.hpp:23-36 activate_nan_trap) and
asserts !isnan(qdd) inside ABA (forward_dynamics.hpp:278-293). Functional
equivalents:

- :func:`activate_nan_trap` flips jax_debug_nans so the first NaN-producing
  primitive raises with a traceback
- :func:`check_finite` / :func:`where_finite` in-graph guards usable under
  jit (checkify-style hard failure or value replacement)
"""

import jax
import jax.numpy as jnp


def activate_nan_trap(enable: bool = True):
    """Raise on the first NaN produced by any primitive (debug runs only —
    disables some fusions)."""
    jax.config.update("jax_debug_nans", enable)


def check_finite(x, name: str = "value"):
    """Host callback assert: raises outside jit, uses debug.check under jit."""
    from jax.experimental import checkify

    ok = jnp.all(jnp.isfinite(x))
    checkify.check(ok, f"non-finite {name} detected")
    return x


def where_finite(x, fallback=0.0):
    """Replace non-finite entries (the production-safe guard)."""
    return jnp.where(jnp.isfinite(x), x, fallback)


def assert_finite_tree(tree, name: str = "pytree"):
    """Eager (non-jit) NaN/Inf sweep over a pytree; raises with leaf paths."""
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite leaves in {name}: {bad}")
