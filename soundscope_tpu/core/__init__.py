from soundscope_tpu.core import constants  # noqa: F401
from soundscope_tpu.core.config import MeterConfig  # noqa: F401
from soundscope_tpu.core.state import MeterState  # noqa: F401


def enable_compile_cache(path: str | None = None) -> None:
    """Point JAX at a persistent compilation cache.

    First compile through the TPU tunnel costs tens of seconds; every
    entry point (CLI, TUI, bench, conformance tool) shares this one
    helper so a fresh process re-analyzing a same-shaped bucket skips
    the recompile. Override the location with $SS_COMPILE_CACHE; safe to
    call repeatedly and before/after jax initialises.
    """
    import os

    import jax

    try:
        if path is None and getattr(jax.config, "jax_compilation_cache_dir",
                                    None):
            return  # a user-configured cache dir wins over our default
        cache = path if path is not None else os.environ.get(
            "SS_COMPILE_CACHE")
        if cache == "":
            # SS_COMPILE_CACHE= (empty) disables persistence entirely.
            # The test suite uses this: CPU compiles are fast, and the
            # shared on-disk cache adds real hazards there (concurrent
            # pytest processes writing the same dir, stale entries from
            # another container host) — one executable-serialization
            # segfault was traced to exactly that.
            return
        if cache is None:
            cache = os.path.expanduser("~/.cache/jax_comp")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # Cache-key stability across entry points: the persistent key
        # hashes the serialized module AFTER strip-debuginfo, but Pallas
        # kernels ride inside tpu_custom_call backend_config as opaque
        # Mosaic bytecode whose locations are callsite-chained through
        # the FULL user stack — so the same program reached via
        # `cli warmup` and `cli analyze` hashed differently and warmup
        # never pre-filled anything (measured: the two Mosaic payloads
        # were the only diff between the modules). Truncated locations
        # make the payload path-independent; an explicit user env
        # setting wins.
        if "JAX_INCLUDE_FULL_TRACEBACKS_IN_LOCATIONS" not in os.environ:
            jax.config.update(
                "jax_include_full_tracebacks_in_locations", False)
    except Exception:  # never let observability plumbing break analysis
        pass
