from . import cacode
