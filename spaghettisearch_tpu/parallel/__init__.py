from .mesh import make_mesh  # noqa: F401
from .sharded import ShardedIndex, make_sharded_scorer, sharded_pagerank  # noqa: F401
