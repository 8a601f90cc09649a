from . import kernels, eos, sphenix
