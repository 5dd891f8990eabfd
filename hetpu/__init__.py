"""hetpu — TPU-native homomorphic encryption framework (CKKS + BFV).

Built from scratch for JAX/XLA/Pallas; capability parity with the
reference C++/SEAL codebase (see SURVEY.md)."""

import os

# Persistent XLA compilation cache: compiles over a remote-device tunnel
# cost 30-100 s each; cache them across processes.
try:
    import jax
    _cache = os.environ.get("HETPU_JAX_CACHE", "/tmp/hetpu_jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover — cache is best-effort
    pass
