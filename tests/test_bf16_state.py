"""bf16 spectral-state option: dtype threading and estimator accuracy.

``RayConfig.spectral_dtype="bfloat16"`` stores the wavefront's spectral
state (throughput/radiance) in bf16 — all arithmetic still promotes to f32;
only the stored state rounds. On the flagship glass Cornell the measured
deviation is ~1.2% relative per ray against a per-ray MC noise of ~300%
(BASELINE.md); here a small closed-form scene pins the same property.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.scenegraph.node import World
from source_tpu.optical.material import Lambert, UnitySurfaceEmitter
from source_tpu.optical.spectrum import ConstantSF
from source_tpu.primitive import Sphere
from source_tpu.parallel.engine import render_batch
from source_tpu.tracer.wavefront import RayConfig


def _setup():
    w = World()
    Sphere(5.0, parent=w, material=UnitySurfaceEmitter())
    Sphere(0.5, parent=w, material=Lambert(ConstantSF(0.5)))
    scene = compile_scene(w, SpectralConfig(400.0, 700.0, 6))
    n = 256
    rng = np.random.RandomState(0)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.full((n, 3), 2.0, np.float32)
    return scene, jnp.asarray(o), jnp.asarray(d, jnp.float32)


def test_bf16_state_threads_and_matches():
    scene, o, d = _setup()
    key = jax.random.PRNGKey(3)
    base = RayConfig(max_depth=6, max_iters=8, extinction_prob=0.05,
                     extinction_min_depth=2)
    out32 = render_batch(scene, base, o, d, key)
    assert out32.radiance.dtype == jnp.float32
    cfg16 = dataclasses.replace(base, spectral_dtype="bfloat16")
    out16 = render_batch(scene, cfg16, o, d, key)
    assert out16.radiance.dtype == jnp.bfloat16
    r32 = np.asarray(out32.radiance, np.float64)
    r16 = np.asarray(out16.radiance, np.float64)
    # identical RNG/paths; only storage rounding differs — max relative
    # error is bounded by bf16 epsilon accumulation over <= 8 bounces
    denom = max(np.abs(r32).mean(), 1e-9)
    rel = np.sqrt(((r16 - r32) ** 2).mean()) / denom
    assert rel < 0.05, rel


def test_bf16_state_with_compaction():
    scene, o, d = _setup()
    key = jax.random.PRNGKey(4)
    cfg = RayConfig(max_depth=6, max_iters=8, extinction_prob=0.05,
                    extinction_min_depth=2, compact_schedule=((2, 2),),
                    spectral_dtype="bfloat16")
    out = render_batch(scene, cfg, o, d, key)
    assert out.radiance.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out.radiance, np.float32)).all()
