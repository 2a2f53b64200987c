from . import bits, ephemeris
