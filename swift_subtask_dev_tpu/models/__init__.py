from . import sph
