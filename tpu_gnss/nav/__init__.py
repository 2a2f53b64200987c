from . import almanac, bits, ephemeris
