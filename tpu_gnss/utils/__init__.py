from . import xfer, metrics, checkpoint
