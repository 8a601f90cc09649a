from . import stencil, bruteforce
