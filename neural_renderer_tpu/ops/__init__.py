from . import brdf, camera, envlight, intersect, linalg, rng, srgb, traversal
