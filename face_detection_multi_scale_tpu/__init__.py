"""TPU-native multi-scale face detection framework.

A from-scratch JAX/XLA/Pallas re-design of the YOLOv7-face multi-scale
detector (reference: NguyendaiAI-pixta/face_detection_multi_scale): anchor-based
face detection with 5-point facial landmarks, multi-scale TTA inference with
scale-aware weighted NMS, WIDER FACE training and evaluation, and a
production batch-prediction pipeline — built on statically-shaped compiled
executables, on-device NMS, and mesh-sharded data parallelism.
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str = "", min_compile_secs: float = 1.0):
    """Persist XLA executables across processes (serving containers, CLI
    re-invocations, bench runs). On remote-compile environments a cold
    compile of the bigger models takes minutes; with the cache a relaunch
    reloads in seconds. Call before the first jit execution. Opt-in: the
    cache key includes the compiled program, so correctness is unaffected,
    but long-running shared hosts may prefer to manage the directory.

    Set FDMS_COMPILATION_CACHE=<dir> (or call this) in serving entry
    points. Measured on this machine: CPU warm reload 33s vs 60s cold;
    but over the axon RELAY the warm path regresses catastrophically
    (970s vs 27s cold — the serialized-executable reload does not suit
    the tunnel), so leave it OFF for tunneled TPUs and use it on
    directly attached hardware only."""
    import os

    import jax

    cache_dir = path or os.environ.get(
        "FDMS_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "fdms_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir


def _maybe_enable_cache_from_env():
    import os

    if os.environ.get("FDMS_COMPILATION_CACHE"):
        enable_compilation_cache()


_maybe_enable_cache_from_env()
