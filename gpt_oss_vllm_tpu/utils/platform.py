"""Device-platform bootstrap.

The attached-TPU environment registers its PJRT plugin from a sitecustomize
module on PYTHONPATH (`/root/.axon_site`). Two failure modes turn every
entry point into a crash or — worse — a silent CPU benchmark:

- a caller overwrites PYTHONPATH, so sitecustomize never runs and the forced
  ``JAX_PLATFORMS`` name has no registered backend;
- the plugin's registered platform name changes across versions while the
  env var pins the old name.

Entry points call :func:`ensure_platform` before first device use: it loads
the plugin's sitecustomize if it was skipped, then relaxes a stale forced
platform list to JAX's automatic selection (accelerator preferred over cpu).
"""

from __future__ import annotations

import os
import sys

import jax

_PLUGIN_SITE = "/root/.axon_site"


def _load_plugin_site() -> None:
    """Run the TPU plugin's sitecustomize if PYTHONPATH lost it."""
    if "sitecustomize" in sys.modules:
        return
    if not os.path.isfile(os.path.join(_PLUGIN_SITE, "sitecustomize.py")):
        return
    if _PLUGIN_SITE not in sys.path:
        sys.path.insert(0, _PLUGIN_SITE)
    try:
        import sitecustomize  # noqa: F401  (registers the PJRT plugin)
    except Exception:
        pass


def ensure_platform() -> str:
    """Return the default backend, repairing a broken platform bootstrap."""
    _load_plugin_site()
    try:
        return jax.default_backend()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        return jax.default_backend()
