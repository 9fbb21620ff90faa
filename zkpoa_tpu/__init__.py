"""zkpoa_tpu: TPU-native proof-of-assets framework.

Persistent-compile-cache bootstrap: this environment's sitecustomize
imports jax (to register the axon TPU backend) BEFORE any user code runs,
so the JAX_COMPILATION_CACHE_DIR / JAX_PERSISTENT_CACHE_* environment
variables the entrypoints set are read too late and silently ignored —
every process then recompiles every kernel (multi-minute Mosaic compiles
on the 2-core host). jax.config.update works post-import, so apply the
env settings here, where every entrypoint passes through.
"""

import os as _os


def _init_compile_cache() -> None:
    cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir:
        return
    try:
        import jax as _jax

        _os.makedirs(cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass


_init_compile_cache()
