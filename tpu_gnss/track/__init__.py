from . import channel, quality
