"""adapt_tpu: a TPU-native (JAX/XLA/Pallas) physically-based wavefront path
tracing framework with the capabilities of the AdaPT reference renderer."""

__version__ = "0.1.0"

from .scene.compile import load_scene, compile_scene, SceneData, RenderConfig
