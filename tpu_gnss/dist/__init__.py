from . import shard
