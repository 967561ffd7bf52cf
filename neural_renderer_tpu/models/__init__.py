from . import encoding, nbvh
