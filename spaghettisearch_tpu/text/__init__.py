from .laundry import laundry, term_stats  # noqa: F401
from .porter2 import stem  # noqa: F401
from .stopwords import STOPWORDS, is_stopword  # noqa: F401
