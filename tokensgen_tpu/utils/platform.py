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

import hashlib
import os


def machine_scoped_cache_dir(
        base: str = "/tmp/tokensgen_tpu_jax_cache") -> str:
    """Persistent-compile-cache dir scoped by a host-CPU-feature fingerprint.

    XLA:CPU AOT cache entries embed the compile machine's CPU features and
    loading a mismatched entry is only an error log ("could lead to execution
    errors such as SIGILL"), not a rejection — so a cache dir carried across
    host types is a latent crash. Keying the directory by the CPU flags gives
    every machine type its own cache. (Context separation matters too: see
    tests/conftest.py — CPU-backend test runs must not share a dir with the
    TPU-context tools.)
    """
    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
        key = hashlib.sha1(flags.encode()).hexdigest()[:8]
    except OSError:
        import platform as _platform

        key = _platform.machine()
    return f"{base}_{key}"


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
