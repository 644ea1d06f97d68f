"""Make `JAX_PLATFORMS` effective in environments that pre-register a PJRT
plugin.

This deployment pins ``JAX_PLATFORMS=axon`` (a TPU tunnel plugin) at the image
level, and once the plugin is registered the environment variable alone no
longer selects the backend — `jax.config.jax_platforms` must be set before the
backend initialises (see tests/conftest.py, which does the same for the test
suite). Every CLI calls `apply_platform_env()` first thing so that e.g.
``JAX_PLATFORMS=cpu python train_to2v.py --smoke`` really runs on the virtual
CPU mesh (the driver's multichip dry-run and the CPU-mesh CLI smokes rely on
this)."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    # `jax_platforms` is an exclusive priority list: setting it to just the
    # accelerator platform would DROP the host backend, and the phase-offload
    # orchestration needs `jax.devices("cpu")` for host-resident master trees.
    # Keep cpu at the end (default backend = first entry, so this never
    # changes which platform computes).
    if "cpu" not in [p.strip() for p in plat.split(",")]:
        plat = plat + ",cpu"
    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        pass  # backend already initialised; keep whatever won
