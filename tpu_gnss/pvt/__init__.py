from . import solve, iono
