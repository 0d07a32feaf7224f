"""Backend-selection runtime helpers."""

import jax

from sketchtpu import runtime


def test_apply_platform_env_mirrors_env(monkeypatch):
    # The deployment image's sitecustomize force-registers a tunneled TPU
    # platform and jax then ignores the JAX_PLATFORMS env var; the runtime
    # must mirror it into jax.config so CPU can be forced reliably.
    monkeypatch.setattr(runtime, "_platform_env_applied", False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    runtime.apply_platform_env()
    assert jax.config.jax_platforms == "cpu"
    # idempotent: second call is a no-op even if config changed meanwhile
    assert runtime._platform_env_applied
    runtime.apply_platform_env()


def test_apply_platform_env_no_env(monkeypatch):
    monkeypatch.setattr(runtime, "_platform_env_applied", False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    before = jax.config.jax_platforms
    runtime.apply_platform_env()
    assert jax.config.jax_platforms == before


def test_backend_selection_env_gates(monkeypatch):
    monkeypatch.setenv("SKETCHTPU_BACKEND", "host")

    class _Kind:
        kind = "dna"

    assert runtime.select_backend(_Kind(), 8) is None
