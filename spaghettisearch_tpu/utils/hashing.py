"""Hash helpers.

Words and URLs are addressed by the hex MD5 of their UTF-8 bytes, matching
the reference key scheme (reference: indexer/indexer.go:38-39, parser/parser.go:30-31)
so that an index built here is row-compatible with one built by the reference.
"""

from __future__ import annotations

import hashlib


def md5_hex(s: str | bytes) -> str:
    if isinstance(s, str):
        s = s.encode("utf-8")
    return hashlib.md5(s).hexdigest()
