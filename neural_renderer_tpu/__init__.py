"""neural_renderer_tpu — a TPU-native neural mesh renderer built on JAX/Pallas.

A ground-up rebuild of the CUDA/OptiX reference (Alehandreus/neural-renderer):
scenes are JSON configs (glTF/OBJ meshes, inner/outer shell pair, HDR environment
map, Disney material overrides) and a learned intersection function — multires
hash-grid + spherical-harmonics encodings feeding a small bf16 MLP on the MXU —
replaces BVH traversal of the full mesh inside the shell volume.

Layout (mirrors SURVEY.md's layer map, redesigned for XLA):
  config          — JSON config schema + camera matrix math   (ref: config_loader.h/cpp)
  scene/          — mesh containers, glTF/OBJ loaders, SAH BVH build, env maps
  ops/            — jit/Pallas compute: RNG, traversal, Disney BRDF, encodings, MLP
  models/         — the neural intersection network (init/apply/checkpoint IO)
  render/         — the wavefront path tracer + multi-segment shell march
  metrics/        — PSNR + pure-JAX FLIP + image IO
  train/          — online training loop (dataset sampling, losses, optax/orbax)
  parallel/       — multi-chip tile data-parallel rendering + DP/TP training shardings
  cli/            — viewer / evaluate / compare_images / train entry points
"""

__version__ = "0.1.0"
