"""sdfstudio-tpu: TPU-native neural implicit surface reconstruction."""

import os as _os

__version__ = "0.1.0"

# SST_PLATFORM=cpu|tpu pins the JAX platform for every sdfstudio entry
# point. Needed because deployment images may force-register a TPU backend
# in sitecustomize with JAX_PLATFORMS set in the kernel env — an env
# override alone doesn't stick there; jax.config.update (pre-backend-init)
# does. Lets CLI tools (train/eval/export) run on CPU while a (possibly
# unreachable) TPU is registered.
if _os.environ.get("SST_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SST_PLATFORM"])
