"""Backend selection: host (NumPy oracle) vs TPU (JAX/Pallas).

The TPU paths produce bit-identical sketches and samebits counts; selection
is therefore purely a performance decision:
- SKETCHTPU_BACKEND=host|tpu forces a backend.
- auto: use the device engine when a non-CPU JAX backend is available and
  the workload is large enough to amortise compilation.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

log = logging.getLogger("sketchtpu")

_cache_ready = False


def enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (the hash kernels have
    large unrolled graphs; compiling them once per (k, bucket) config and
    reusing from disk matters a lot on cold starts)."""
    global _cache_ready
    if _cache_ready:
        return
    _cache_ready = True
    apply_platform_env()
    try:
        import jax

        cache_dir = os.environ.get(
            "SKETCHTPU_JAX_CACHE",
            str(Path.home() / ".cache" / "sketchtpu" / "jax_cache"),
        )
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # pragma: no cover
        log.debug("could not enable jax compilation cache: %s", exc)

_MIN_SAMPLES_FOR_DEVICE_SKETCH = 1
_MIN_SAMPLES_FOR_DEVICE_DIST = 64

_platform_env_applied = False


def apply_platform_env() -> None:
    """Mirror the JAX_PLATFORMS env var into jax's config.

    Deployment images may force-register an out-of-process TPU platform
    via sitecustomize, in which case jax ignores the env var and backend
    init can hang indefinitely when that device is unreachable. Applying
    the value through jax.config makes `JAX_PLATFORMS=cpu` a reliable
    escape hatch to host execution."""
    global _platform_env_applied
    if _platform_env_applied:
        return
    _platform_env_applied = True
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    try:
        import jax

        jax.config.update("jax_platforms", env)
    except Exception as exc:  # pragma: no cover
        log.debug("could not apply JAX_PLATFORMS=%s: %s", env, exc)


def _mode() -> str:
    # every backend/engine selector reads the mode before touching jax, so
    # this is the choke point for the JAX_PLATFORMS mirror (mode=="tpu"
    # short-circuits past _device_available straight into jax.devices())
    apply_platform_env()
    return os.environ.get("SKETCHTPU_BACKEND", "auto")


def _device_available() -> bool:
    try:
        import jax

        apply_platform_env()
        platform = jax.default_backend()
        return platform not in ("cpu",)
    except Exception:
        return False


def select_backend(seq_type, n_samples: int):
    """Batched device sketching backend, or None for the host path."""
    mode = _mode()
    if mode == "host":
        return None
    if mode == "tpu" or (
        _device_available() and n_samples >= _MIN_SAMPLES_FOR_DEVICE_SKETCH
    ):
        try:
            if seq_type.kind == "dna":
                from .sketchcore.sketch_jax import DeviceSketchBackend

                return DeviceSketchBackend()
            # aa / pdb (3Di strings hashed as AA level 1)
            from .sketchcore.sketch_aa_jax import DeviceAaSketchBackend

            return DeviceAaSketchBackend()
        except Exception as exc:  # pragma: no cover
            log.warning("device sketch backend unavailable (%s); using host", exc)
            return None
    return None


_MIN_SAMPLES_FOR_DEVICE_COREACC = 2048


def select_coreacc_engine(ms, completeness_vec=None,
                          completeness_cutoff: float = 0.64,
                          exact: bool = False):
    """Fully on-device core/accessory engine for large dense runs (f32; the
    exact f64 host pipeline is used for small runs). Completeness
    correction runs on device too — the per-k Jaccard correction folds
    into the regression chain of both the fused Pallas tile and the XLA
    tile (after the samebits psum on the multi-chip sharded engine).

    exact=True (`dist --exact`) selects the exact-output stream engine:
    per-k int16 samebits strips on device, the oracle's f64 chain on the
    host — byte-identical output to the host pipeline at a device->host
    transfer and host-format cost (see DeviceCoreAccExactStreamEngine)."""
    mode = _mode()
    if mode == "host":
        return None
    n = ms.number_samples_loaded()
    if len(ms.kmer_lengths) < 2:
        return None
    if exact and ms.sketchsize64 * 64 > 32767:
        # not silent: the user asked for --exact and gets the host path
        log.info(
            "--exact: sketch size %d bins exceeds the device exact "
            "engine's int16 samebits range (max 32767 bins); using the "
            "host f64 pipeline (output is identical, just slower)",
            ms.sketchsize64 * 64,
        )
        return None  # samebits would overflow the exact engine's int16 strips
    if mode == "tpu" or (
        _device_available() and n >= _MIN_SAMPLES_FOR_DEVICE_COREACC
    ):
        try:
            import jax

            if exact:
                from .dist.coreacc_jax import DeviceCoreAccExactStreamEngine

                return DeviceCoreAccExactStreamEngine(
                    ms,
                    completeness_vec=completeness_vec,
                    completeness_cutoff=completeness_cutoff,
                )
            if len(jax.local_devices()) > 1:
                from .shard.mesh import ShardedCoreAccEngine

                return ShardedCoreAccEngine(
                    ms,
                    completeness_vec=completeness_vec,
                    completeness_cutoff=completeness_cutoff,
                )
            from .dist.coreacc_jax import DeviceCoreAccEngine

            return DeviceCoreAccEngine(
                ms,
                completeness_vec=completeness_vec,
                completeness_cutoff=completeness_cutoff,
            )
        except Exception as exc:  # pragma: no cover
            log.warning("device core-acc engine unavailable (%s); using host", exc)
            return None
    return None


_MIN_SAMPLES_FOR_DEVICE_INVERTED = 512
_MIN_SAMPLES_FOR_DEVICE_KNN = 4096
_MIN_SAMPLES_FOR_DEVICE_DENSE_STREAM = 8192


def select_dense_stream_engine(ms, dist_type):
    """Streaming device engine for large single-k dense self runs. Output
    values are identical to the host path (exact int32 samebits on device,
    f64 chain on host), so this is purely a throughput decision; supports
    completeness correction."""
    mode = _mode()
    if mode == "host" or dist_type.coreacc:
        return None
    if ms.sketchsize64 * 64 > 32767:
        return None  # samebits would overflow the engine's int16 strips
    n = ms.number_samples_loaded()
    if mode == "tpu" or (
        _device_available() and n >= _MIN_SAMPLES_FOR_DEVICE_DENSE_STREAM
    ):
        try:
            from .dist.jaccard_jax import DeviceDenseStreamEngine

            return DeviceDenseStreamEngine(ms, dist_type.k_idx)
        except Exception as exc:  # pragma: no cover
            log.warning(
                "device dense-stream engine unavailable (%s); using host", exc
            )
            return None
    return None


def select_knn_engine(ms, dist_type):
    """On-device kNN engine for large sparse runs (selection by samebits on
    device, exact f64 distance values; core-acc mode is f32 like the dense
    device engine). With completeness correction, selection keys on the
    corrected f32 distance (per-sample correction breaks samebits
    monotonicity) and single-k values are still recomputed exactly on the
    host from the selected samebits, on both the single-device and
    sharded engines."""
    mode = _mode()
    if mode == "host":
        return None
    n = ms.number_samples_loaded()
    if dist_type.coreacc and len(ms.kmer_lengths) < 2:
        return None
    if mode == "tpu" or (
        _device_available() and n >= _MIN_SAMPLES_FOR_DEVICE_KNN
    ):
        try:
            import jax

            if len(jax.local_devices()) > 1:
                from .shard.mesh import ShardedKnnEngine

                return ShardedKnnEngine(ms)
            from .dist.knn_jax import DeviceKnnEngine

            return DeviceKnnEngine(ms)
        except Exception as exc:  # pragma: no cover
            log.warning("device knn engine unavailable (%s); using host", exc)
            return None
    return None


def select_inverted_engine(inv):
    """Device equality-tile engine for inverted-index queries/precluster."""
    mode = _mode()
    if mode == "host":
        return None
    if mode == "tpu" or (
        _device_available() and inv.n_samples >= _MIN_SAMPLES_FOR_DEVICE_INVERTED
    ):
        try:
            import jax

            if len(jax.local_devices()) > 1:
                from .shard.mesh import ShardedInvertedEngine

                return ShardedInvertedEngine(inv.sign_matrix)
            from .inverted.device import DeviceInvertedEngine

            return DeviceInvertedEngine(inv.sign_matrix)
        except Exception as exc:  # pragma: no cover
            log.warning("device inverted engine unavailable (%s); using host", exc)
            return None
    return None


def select_engine(ms):
    """samebits engine for distance drivers, or None for the host path.

    With more than one device, row blocks shard over the full mesh
    (ShardedSamebitsEngine); output is identical either way (exact int32
    samebits)."""
    mode = _mode()
    if mode == "host":
        return None
    n = ms.number_samples_loaded()
    if mode == "tpu" or (_device_available() and n >= _MIN_SAMPLES_FOR_DEVICE_DIST):
        try:
            import jax

            if len(jax.local_devices()) > 1:
                from .shard.mesh import ShardedSamebitsEngine

                return ShardedSamebitsEngine(ms.sketchsize64).matrix
            from .dist.jaccard_jax import DeviceSamebitsEngine

            return DeviceSamebitsEngine(ms.sketchsize64).matrix
        except Exception as exc:  # pragma: no cover
            log.warning("device distance engine unavailable (%s); using host", exc)
            return None
    return None
