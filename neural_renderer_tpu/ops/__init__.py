from . import (brdf, camera, denoise, envlight, fused_network, intersect,
               linalg, rng, srgb, trace_pallas, traversal)
