from . import loaders
