"""hrt_tpu — a TPU-native wavefront path tracer (JAX / XLA / Pallas).

A ground-up rebuild of the capabilities of the "Bloon RT Engine"
(CodingBloon/Hardware-Ray-Tracer): hardware ray tracing via Vulkan
VK_KHR_ray_tracing_pipeline re-designed for TPUs.  Everything the GPU
driver provides for free there (BVH build, traversal, shader scheduling)
is implemented here as JAX programs and Pallas kernels:

- ``models``   — scene-domain objects: camera, meshes, materials, lights,
                 sky, instances, and the Scene builder producing flat SoA
                 device arrays (ref: Graphics/RayTracing/Scene.*).
- ``ops``      — compute kernels: RNG, intersection, LBVH build,
                 BVH traversal (Pallas), Disney BRDF, samplers, wavefront
                 queues, denoiser (ref: shaders/*.slang + driver BVH).
- ``parallel`` — multi-chip tile sharding over a jax.sharding.Mesh.
- ``utils``    — image IO, logging, numpy oracle for testing.

The hot path is a single jitted frame program
``trace -> shade -> denoise -> upscale`` (ref: vkCmdTraceRaysKHR dispatch,
Graphics/RayTracing/RTPipeline.cpp:41-43).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: traversal kernels are expensive to
# compile (minutes); cache hits bring reruns down to seconds.
if not _os.environ.get("HRT_TPU_NO_CACHE"):
    import jax as _jax

    _cache = _os.environ.get(
        "HRT_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "hrt_tpu_xla"))
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
