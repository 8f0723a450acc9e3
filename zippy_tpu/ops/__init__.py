"""Device (TPU/XLA) compute paths for zippy_tpu.

Importing this package enables JAX's persistent compilation cache: device
kernels here compile slowly over the remote-compile tunnel (tens of seconds
to minutes per shape), and the cache makes that a one-time cost per shape
across processes.
"""

import os as _os

import jax as _jax

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache_dir = _os.path.join(
        _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache")),
        "zippy_tpu_jax",
    )
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
