"""lbc-tpu: TPU-native batched driving-world framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
dotchen/LearningByCheating (CoRL 2019). The reference's client/server hot
loop (one CARLA UE4 server per env, 10 Hz TCP RPC) is replaced by a single
jitted, vmapped, mesh-sharded `step` function over device-resident world
state.
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache for every lbc_tpu process.

    The benchmark/training pipeline launches many short-lived python
    processes that jit the same programs; over the tunneled TPU client a
    cold compile costs minutes, so cross-process reuse matters far more
    than in a typical deployment. Best-effort: backends that can't
    serialize executables just fall back to compiling.
    """
    import os
    try:
        import jax
        cache_dir = os.environ.get('LBC_TPU_COMPILATION_CACHE',
                                   os.path.expanduser('~/.cache/lbc_jax'))
        if cache_dir and cache_dir != '0':
            jax.config.update('jax_compilation_cache_dir', cache_dir)
            jax.config.update(
                'jax_persistent_cache_min_compile_time_secs', 10.0)
    except Exception:           # pragma: no cover - never block imports
        pass


_enable_compilation_cache()
